"""Sorts / limits / top-K / pagination (SURVEY.md §2.6).

Phoenix: ORDER BY compiles to a client in-memory sort (reference:
phoenix-core-client/.../compile/OrderByCompiler.java, iterate/
OrderedResultIterator.java); ORDER BY + LIMIT runs per-region TopN in the
coprocessor with a client merge of N-sized streams (server
NonAggregateRegionScannerFactory.java:250-254, client
MergeSortTopNResultIterator.java); integer OFFSET skips client-side
(OffsetCompiler); RVC OFFSET resumes a scan after a PK point
(RVCOffsetCompiler.java) — O(1) pagination.

Spark mapping: orderBy/limit lowers to TakeOrderedAndProject — the exact
per-partition-TopN + driver-merge shape Phoenix implements by hand; at 100 TB
only K rows per partition ever move, never a full sort.  RVC pagination stays
a pushed-down struct-comparison filter, so each page is a fresh pruned scan.

Note on the oracle: the hash-compare is order-insensitive, so every ordering
semantic here is pinned through a LIMIT *cut* (which rows survive), with a
unique-key tiebreak making the cut deterministic on both engines.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from phoenix_spark.queries._util import Registry, t

REG = Registry()


def _nullable_bal(spark, sf):
    # Fixtures are NULL-free; manufacture NULLs (negative balances) the same
    # way filter_null_3vl does, so NULLS FIRST/LAST placement is observable.
    return t(spark, sf, "customer").withColumn(
        "bal",
        F.when(F.col("c_acctbal") < 0, F.lit(None)).otherwise(F.col("c_acctbal")),
    )


_BAL_SQL = """
  SELECT c_custkey,
         CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END AS bal
  FROM customer
"""

# --- ORDER BY ... NULLS FIRST, cut by LIMIT ---------------------------------
REG.add(
    "sort_nulls_first",
    lambda spark, sf: _nullable_bal(spark, sf)
    .select("c_custkey", F.col("bal").cast("double").alias("bal"))
    .orderBy(F.col("bal").asc_nulls_first(), F.col("c_custkey"))
    .limit(20),
    f"""
    SELECT c_custkey, CAST(bal AS DOUBLE) AS bal FROM ({_BAL_SQL}) x
    ORDER BY bal ASC NULLS FIRST, c_custkey LIMIT 20
    """,
)

# --- ORDER BY ... NULLS LAST, cut by LIMIT ----------------------------------
REG.add(
    "sort_nulls_last",
    lambda spark, sf: _nullable_bal(spark, sf)
    .select("c_custkey", F.col("bal").cast("double").alias("bal"))
    .orderBy(F.col("bal").asc_nulls_last(), F.col("c_custkey"))
    .limit(20),
    f"""
    SELECT c_custkey, CAST(bal AS DOUBLE) AS bal FROM ({_BAL_SQL}) x
    ORDER BY bal ASC NULLS LAST, c_custkey LIMIT 20
    """,
)

# --- top-K (MergeSortTopNResultIterator → TakeOrderedAndProject) ------------
REG.add(
    "sort_topk",
    lambda spark, sf: t(spark, sf, "orders")
    .select(
        "o_orderkey",
        F.col("o_totalprice").cast("double").alias("o_totalprice"),
    )
    .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    .limit(15),
    """
    SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS o_totalprice
    FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 15
    """,
)

# --- LIMIT as a row-count cap (LimitCompiler → PageFilter) -------------------
# Without ORDER BY the cut is engine-arbitrary, so the limit deliberately
# exceeds the filtered cardinality: semantics pinned = "LIMIT caps count".
REG.add(
    "sort_limit_cap",
    lambda spark, sf: t(spark, sf, "nation")
    .filter(F.col("n_regionkey") == 2)
    .limit(100),
    "SELECT * FROM nation WHERE n_regionkey = 2 LIMIT 100",
)

# --- integer OFFSET (OffsetCompiler/OffsetResultIterator; Spark ≥3.4) --------
REG.add(
    "sort_offset",
    lambda spark, sf: t(spark, sf, "orders")
    .select(
        "o_orderkey",
        F.col("o_totalprice").cast("double").alias("o_totalprice"),
    )
    .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    .offset(10)
    .limit(10),
    """
    SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS o_totalprice
    FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10 OFFSET 10
    """,
)

# --- RVC OFFSET pagination (RVCOffsetCompiler.java) --------------------------
# Resume after the PK point (14000, 2): a pushed-down range filter, not a
# row-skip — each page costs one pruned scan at any scale.
REG.add(
    "sort_rvc_offset_page",
    lambda spark, sf: t(spark, sf, "lineitem")
    .filter(
        F.struct("l_orderkey", "l_linenumber")
        > F.struct(
            F.lit(14000).cast("long").alias("l_orderkey"),
            F.lit(2).cast("int").alias("l_linenumber"),
        )
    )
    .select("l_orderkey", "l_linenumber", "l_partkey")
    .orderBy("l_orderkey", "l_linenumber", "l_partkey")
    .limit(25),
    """
    SELECT l_orderkey, l_linenumber, l_partkey FROM lineitem
    WHERE (l_orderkey, l_linenumber) > (14000, 2)
    ORDER BY l_orderkey, l_linenumber, l_partkey LIMIT 25
    """,
)

# --- FETCH FIRST n ROWS ONLY (ANSI LIMIT spelling, grammar :885) -------------
REG.add(
    "sort_fetch_first",
    lambda spark, sf: t(spark, sf, "orders")
    .select("o_orderkey", "o_orderdate")
    .orderBy("o_orderdate", "o_orderkey")
    .limit(5),
    """
    SELECT o_orderkey, o_orderdate FROM orders
    ORDER BY o_orderdate, o_orderkey FETCH FIRST 5 ROWS ONLY
    """,
)


# --- RVC OFFSET SQL form (RVCOffsetCompiler.java; QueryMoreIT) ---------------
# ``OFFSET (pk...)=(values...)`` resumes strictly AFTER the PK point in the
# table's PK STORAGE order — DESC components flip their comparison.  The
# engine lowers it to the lexicographic residual, pushed to the scan.
def _rvc_offset_sql(spark, sf):
    import tempfile

    from phoenix_spark.engine import Engine

    e = Engine(spark, sf_dir=sf, warehouse=tempfile.mkdtemp(prefix="phx_wh_"))
    e.sql(
        "CREATE TABLE t_pgsnap (org CHAR(4) NOT NULL, score DOUBLE NOT NULL, "
        "ent BIGINT NOT NULL, CONSTRAINT pk PRIMARY KEY "
        "(org, score DESC, ent DESC))"
    )
    e.sql(
        "UPSERT INTO t_pgsnap SELECT 'org1', CAST(o_orderkey % 7 AS DOUBLE), "
        "o_orderkey FROM orders WHERE o_orderkey <= 500"
    )
    return e.sql(
        "SELECT ent, score FROM t_pgsnap "
        "ORDER BY org, score DESC, ent DESC LIMIT 40 "
        "OFFSET (ORG, SCORE, ENT)=('org1', 5, 250)"
    )


REG.add(
    "sort_rvc_offset_sql",
    _rvc_offset_sql,
    """
    SELECT o_orderkey AS ent, CAST(o_orderkey % 7 AS DOUBLE) AS score
    FROM orders
    WHERE o_orderkey <= 500 AND (
      (o_orderkey % 7) < 5 OR ((o_orderkey % 7) = 5 AND o_orderkey < 250))
    ORDER BY score DESC, ent DESC LIMIT 40
    """,
)
