"""Scans / sources (SURVEY.md §2.1).

Phoenix compiles scans into region-parallel HBase scans chunked by region
boundaries and stats guideposts (reference: phoenix-core-client/.../iterate/
BaseResultIterators.java:141, getParallelScans :727).  In Spark the parquet
reader gives partition-parallel scans natively; these queries pin the
*semantics*: projection/column pruning, PK point lookup, skip-scan
(multi-range PK predicates), deterministic TABLESAMPLE, serial scan.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from phoenix_spark.queries._util import Registry, t

REG = Registry()

# --- full scan with projection (column pruning reaches the parquet footer) --
REG.add(
    "scan_projection",
    lambda spark, sf: t(spark, sf, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    ),
    "SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem",
)

# --- point lookup: PK equality short-circuit -------------------------------
# Reference: ScanRanges.isPointLookup (.../compile/ScanRanges.java),
# QueryOptimizer.java:230-236.  Spark: filter on PK → parquet row-group
# min/max skipping; semantically a plain filter.
REG.add(
    "scan_point_lookup",
    lambda spark, sf: t(spark, sf, "orders").filter(F.col("o_orderkey") == 1042),
    "SELECT * FROM orders WHERE o_orderkey = 1042",
)

# --- skip scan: cross-product of per-PK-column ranges ----------------------
# Reference: SkipScanFilter (.../filter/SkipScanFilter.java:58),
# WhereOptimizer.java:375-382.
REG.add(
    "scan_skip",
    lambda spark, sf: t(spark, sf, "lineitem")
    .filter(
        F.col("l_orderkey").isin(11, 308, 1042, 2077, 4521, 9001)
        & F.col("l_linenumber").between(1, 3)
    )
    .select("l_orderkey", "l_linenumber", "l_partkey", "l_quantity"),
    """
    SELECT l_orderkey, l_linenumber, l_partkey, l_quantity FROM lineitem
    WHERE l_orderkey IN (11, 308, 1042, 2077, 4521, 9001)
      AND l_linenumber BETWEEN 1 AND 3
    """,
)

# --- TABLESAMPLE: deterministic hash-mod sampling --------------------------
# Reference: TableSamplerPredicate (.../iterate/TableSamplerPredicate.java)
# uses FNV1a(rowkey) vs rate for an even, deterministic sample.  For
# oracle-comparability we use a Knuth multiplicative hash both engines can
# evaluate identically in bigint arithmetic (NOT df.sample, which is
# seed/partition dependent).  The key is reduced mod 2^31 BEFORE the Knuth
# multiply so the product stays < 2^31 * 2654435761 ≈ 5.7e18 < int64 max —
# overflow-safe for any orderkey magnitude (100 TB scale included), and both
# engines evaluate it in exact int64 arithmetic.
REG.add(
    "scan_tablesample",
    lambda spark, sf: t(spark, sf, "orders")
    .filter(
        F.pmod(
            F.pmod(
                F.pmod(F.col("o_orderkey"), F.lit(2147483648)) * F.lit(2654435761),
                F.lit(4294967296),
            ),
            F.lit(100),
        )
        < 10
    )
    .select("o_orderkey", "o_custkey", "o_totalprice"),
    """
    SELECT o_orderkey, o_custkey, o_totalprice FROM orders
    WHERE (((o_orderkey % 2147483648) * 2654435761) % 4294967296) % 100 < 10
    """,
)

# --- serial scan (SERIAL hint → single-threaded small scan) ----------------
# Reference: SerialIterators (.../iterate/SerialIterators.java),
# HintNode.SERIAL.  Spark: coalesce(1) — a physical nicety only.
REG.add(
    "scan_serial",
    lambda spark, sf: t(spark, sf, "region").coalesce(1).select("r_regionkey", "r_name"),
    "SELECT r_regionkey, r_name FROM region",
)
