"""Aggregation surface (SURVEY.md §2.4).

Phoenix aggregates are two-phase: server partial per region (reference:
phoenix-core-server/.../coprocessor/GroupedAggregateRegionObserver.java:101,
UngroupedAggregateRegionScanner) + client final merge (ClientAggregators).
Spark's partial/final HashAggregate has the identical shape natively — map-side
combine then shuffle-by-group-key — so every query here is a plain
groupBy/agg; what we pin is the *function semantics* vs the oracle.

Determinism: double sums are order-dependent, so all hashed SUM/AVG run on
exact DECIMAL inputs (see queries/_util.py docstring).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from phoenix_spark.queries._util import Registry, bsum, dec, dsum, t, views

REG = Registry()

# --- ungrouped aggregate (AggregatePlan, UngroupedAggregateRegionObserver) --
REG.add(
    "agg_ungrouped",
    lambda spark, sf: t(spark, sf, "lineitem").agg(
        F.count(F.lit(1)).alias("n_rows"),
        dsum("l_quantity").alias("sum_qty"),
        F.min("l_quantity").cast("double").alias("min_qty"),
        F.max("l_quantity").cast("double").alias("max_qty"),
        (F.sum(dec("l_extendedprice")).cast("double") / F.count(F.lit(1))).alias(
            "avg_price"
        ),
        bsum("l_linenumber").alias("sum_line"),
    ),
    """
    SELECT COUNT(*) AS n_rows,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(MIN(l_quantity) AS DOUBLE) AS min_qty,
           CAST(MAX(l_quantity) AS DOUBLE) AS max_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
             AS avg_price,
           CAST(SUM(l_linenumber) AS BIGINT) AS sum_line
    FROM lineitem
    """,
)

# --- TPC-H Q1 skeleton: the flagship grouped aggregate ---------------------
# decimal(12,2) factors keep the 3-way product within decimal(38,6) => exact
# in both engines (see _util docstring).
def q1_pricing_summary(spark, sf):
    li = t(spark, sf, "lineitem")
    d12 = lambda c: F.col(c).cast("decimal(12,2)")  # noqa: E731
    one = F.lit(1).cast("decimal(12,2)")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            F.sum(d12("l_extendedprice") * (one - d12("l_discount")))
            .cast("double")
            .alias("sum_disc_price"),
            F.sum(
                d12("l_extendedprice")
                * (one - d12("l_discount"))
                * (one + d12("l_tax"))
            )
            .cast("double")
            .alias("sum_charge"),
            (F.sum(dec("l_quantity")).cast("double") / F.count(F.lit(1))).alias(
                "avg_qty"
            ),
            (F.sum(dec("l_discount")).cast("double") / F.count(F.lit(1))).alias(
                "avg_disc"
            ),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


REG.add(
    "q1_pricing_summary",
    q1_pricing_summary,
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
                    (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))))
                AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
                    (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))) *
                    (CAST(1 AS DECIMAL(12,2)) + CAST(l_tax AS DECIMAL(12,2))))
                AS DOUBLE) AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
           CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)

# --- unordered (hash) group-by on a non-PK, higher-cardinality key ---------
# Reference: GroupedAggregateRegionObserver UNORDERED path with
# SpillableGroupByCache; Spark: Tungsten hash agg with native spill.
REG.add(
    "agg_groupby_hash",
    lambda spark, sf: t(spark, sf, "lineitem")
    .groupBy("l_partkey")
    .agg(
        F.count(F.lit(1)).alias("n"),
        dsum("l_extendedprice").alias("revenue"),
    ),
    """
    SELECT l_partkey, COUNT(*) AS n,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM lineitem GROUP BY l_partkey
    """,
)

# --- order-preserving (stream) group-by: PK-prefix keys --------------------
# Reference: GroupByCompiler.GroupBy.isOrderPreserving — a physical nicety;
# semantics identical to hash group-by.
REG.add(
    "agg_groupby_pk_prefix",
    lambda spark, sf: t(spark, sf, "lineitem")
    .groupBy("l_orderkey")
    .agg(F.count(F.lit(1)).alias("n_lines"), dsum("l_quantity").alias("sum_qty")),
    """
    SELECT l_orderkey, COUNT(*) AS n_lines,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem GROUP BY l_orderkey
    """,
)

# --- DISTINCT (DistinctAggregatingResultIterator / DistinctPrefixFilter) ---
REG.add(
    "agg_distinct",
    lambda spark, sf: t(spark, sf, "lineitem")
    .select("l_returnflag", "l_linestatus")
    .distinct(),
    "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
)

# --- COUNT(DISTINCT) per group (DistinctCountAggregateFunction) ------------
REG.add(
    "agg_count_distinct",
    lambda spark, sf: t(spark, sf, "orders")
    .groupBy("o_orderstatus")
    .agg(
        F.countDistinct("o_custkey").alias("n_cust"),
        F.count(F.lit(1)).alias("n_orders"),
    ),
    """
    SELECT o_orderstatus, CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_cust,
           COUNT(*) AS n_orders
    FROM orders GROUP BY o_orderstatus
    """,
)

# --- HAVING (HavingCompiler; group-key conjuncts move to WHERE) ------------
REG.add(
    "agg_having",
    lambda spark, sf: t(spark, sf, "lineitem")
    .groupBy("l_suppkey")
    .agg(dsum("l_extendedprice").alias("revenue"), F.count(F.lit(1)).alias("n"))
    .filter((F.col("revenue") > 5000000) & (F.col("l_suppkey") != 10)),
    """
    SELECT l_suppkey,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
           COUNT(*) AS n
    FROM lineitem GROUP BY l_suppkey
    HAVING CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) > 5000000
       AND l_suppkey <> 10
    """,
)

# --- STDDEV_POP / STDDEV_SAMP (BaseStddevAggregator) -----------------------
# Computed from exact decimal SUM/SUM-of-squares so both engines evaluate the
# identical scalar double expression (population & sample variants).
def _stddev(spark, sf):
    li = t(spark, sf, "lineitem")
    g = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("double").alias("_n"),
        F.sum(dec("l_quantity")).cast("double").alias("_s"),
        F.sum(dec("l_quantity") * dec("l_quantity")).cast("double").alias("_s2"),
    )
    var_pop = (F.col("_s2") - F.col("_s") * F.col("_s") / F.col("_n")) / F.col("_n")
    var_samp = (F.col("_s2") - F.col("_s") * F.col("_s") / F.col("_n")) / (
        F.col("_n") - 1
    )
    return g.select(
        "l_returnflag",
        F.sqrt(var_pop).alias("stddev_pop_qty"),
        F.sqrt(var_samp).alias("stddev_samp_qty"),
    )


REG.add(
    "agg_stddev",
    _stddev,
    """
    SELECT l_returnflag,
           SQRT((_s2 - _s * _s / _n) / _n) AS stddev_pop_qty,
           SQRT((_s2 - _s * _s / _n) / (_n - 1)) AS stddev_samp_qty
    FROM (
      SELECT l_returnflag,
             CAST(COUNT(*) AS DOUBLE) AS _n,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS _s,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) *
                      CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS _s2
      FROM lineitem GROUP BY l_returnflag) g
    """,
)

# --- PERCENTILE_CONT / PERCENTILE_DISC WITHIN GROUP (grammar :1157-1165) ---
# PercentileClientAggregator / PercentileDiscClientAggregator.  Quantities
# are integral, so CONT interpolation lands on exact .0/.5 values in both
# engines.
def _percentile(spark, sf):
    views(spark, sf)
    return spark.sql(
        """
        SELECT l_returnflag,
               percentile_cont(0.5) WITHIN GROUP (ORDER BY l_quantity)
                 AS median_qty,
               percentile_cont(0.9) WITHIN GROUP (ORDER BY l_quantity) AS p90_qty,
               percentile_disc(0.5) WITHIN GROUP (ORDER BY l_quantity)
                 AS median_disc_qty
        FROM lineitem GROUP BY l_returnflag
        """
    )


REG.add(
    "agg_percentile",
    _percentile,
    """
    SELECT l_returnflag,
           percentile_cont(0.5) WITHIN GROUP (ORDER BY l_quantity) AS median_qty,
           percentile_cont(0.9) WITHIN GROUP (ORDER BY l_quantity) AS p90_qty,
           percentile_disc(0.5) WITHIN GROUP (ORDER BY l_quantity) AS median_disc_qty
    FROM lineitem GROUP BY l_returnflag
    """,
)

# --- FIRST_VALUE / LAST_VALUE ordered-set aggregates -----------------------
# Reference: FirstLastValueBaseFunction (NOT window functions in Phoenix).
# NOTE: the fixture's (l_orderkey, l_linenumber) is not unique, so plain
# min_by/max_by would be tie-nondeterministic; we take the lexicographic
# MIN/MAX of an (ordering-key, value) struct — deterministic in both engines.
REG.add(
    "agg_first_last_value",
    lambda spark, sf: t(spark, sf, "lineitem")
    .withColumn("_ord", F.col("l_orderkey") * 10 + F.col("l_linenumber"))
    .groupBy("l_returnflag")
    .agg(
        F.min(F.struct(F.col("_ord").alias("o"), F.col("l_extendedprice").alias("p")))[
            "p"
        ]
        .cast("double")
        .alias("first_price"),
        F.max(F.struct(F.col("_ord").alias("o"), F.col("l_extendedprice").alias("p")))[
            "p"
        ]
        .cast("double")
        .alias("last_price"),
    ),
    """
    SELECT l_returnflag,
           CAST((MIN(struct_pack(o := l_orderkey * 10 + l_linenumber,
                                 p := l_extendedprice))).p AS DOUBLE) AS first_price,
           CAST((MAX(struct_pack(o := l_orderkey * 10 + l_linenumber,
                                 p := l_extendedprice))).p AS DOUBLE) AS last_price
    FROM lineitem GROUP BY l_returnflag
    """,
)

# --- APPROX_COUNT_DISTINCT (HyperLogLog++) ---------------------------------
# Reference: DistinctCountHyperLogLogAggregateFunction.java:41-49.  Spark's
# HLL++ sketch differs from DuckDB's approx algorithm, so the raw estimate
# has no cross-engine value oracle.  Instead the entry verifies the
# engine-independent CONTRACT: the estimate lands within the sketch's error
# bound of the exact count (rsd 0.05 default; 15 % is a comfortable
# deterministic margin — the sketch has no RNG, so for a fixed dataset the
# estimate is a fixed value).  The exact count anchors the hash.
REG.add(
    "agg_approx_count_distinct",
    lambda spark, sf: t(spark, sf, "lineitem").agg(
        F.countDistinct("l_partkey").cast("long").alias("exact_parts"),
        (
            F.abs(
                F.approx_count_distinct("l_partkey").cast("double")
                - F.countDistinct("l_partkey").cast("double")
            )
            <= F.countDistinct("l_partkey").cast("double") * F.lit(0.15)
        ).alias("approx_within_15pct"),
    ),
    """
    SELECT CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
           true AS approx_within_15pct
    FROM lineitem
    """,
)

# --- ROLLUP / CUBE / GROUPING SETS (beyond-reference: Phoenix lacks these,
# Spark has them native — declared extension surface per SURVEY §2.4) -------
def _rollup(spark, sf):
    views(spark, sf)
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        """
    )


REG.add(
    "agg_rollup",
    _rollup,
    """
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
