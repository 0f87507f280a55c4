"""Ordered-set aggregate tail + grouping extensions (SURVEY.md §2.4).

Closes the VERDICT-flagged partials:
  * PERCENT_RANK (PercentRankClientAggregator — Phoenix computes it as an
    inverse-distribution aggregate; the window form is the Spark-native
    superset and yields the same (rank-1)/(n-1) values)
  * NTH_VALUE / FIRST_VALUES / LAST_VALUES (NthValueFunction.java,
    FirstValuesFunction / LastValuesFunction — ordered-set aggregates that
    return the value(s) at the order extremes per group)
  * CUBE / GROUPING SETS (beyond-reference extensions; ROLLUP already pinned
    in aggregates.py)
  * APPROX_PERCENTILE — the at-scale variant of agg_percentile: Phoenix
    ships the full value map to the client (exact but O(cardinality));
    `approx_percentile` is the bounded-memory sketch answer (rows-only
    check, sketches are engine-specific).

Determinism: nth/first/last orderings always carry the value itself as the
final sort key so duplicate (orderkey, linenumber) rows (the fixture PK is
not unique!) can't flip the selection; quantities are integral so their
string/array renderings agree across engines.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from phoenix_spark.queries._util import Registry, dec, dsum, t, views

REG = Registry()

# --- PERCENT_RANK ------------------------------------------------------------
def _percent_rank(spark, sf):
    views(spark, sf)
    return spark.sql(
        """
        SELECT o_orderkey,
               percent_rank() OVER (PARTITION BY o_orderstatus
                                    ORDER BY o_totalprice) AS pr
        FROM orders
        """
    )


REG.add(
    "agg_percent_rank",
    _percent_rank,
    """
    SELECT o_orderkey,
           percent_rank() OVER (PARTITION BY o_orderstatus
                                ORDER BY o_totalprice) AS pr
    FROM orders
    """,
)

# --- NTH_VALUE / FIRST_VALUES / LAST_VALUES as ordered-set aggregates --------
# Spark lowering: collect_list(struct(order_keys..., value)) → sort_array →
# slice; the struct sort is lexicographic, matching DuckDB's multi-key
# `list(x ORDER BY ...)`.
def _nth_values(spark, sf):
    li = t(spark, sf, "lineitem").select(
        "l_returnflag",
        F.col("l_orderkey").alias("k1"),
        F.col("l_linenumber").alias("k2"),
        F.col("l_quantity").cast("long").alias("q"),
    )
    sorted_arr = F.sort_array(
        F.collect_list(F.struct("k1", "k2", "q"))
    )
    return li.groupBy("l_returnflag").agg(
        F.element_at(sorted_arr, 3)["q"].alias("nth3_qty"),
        F.array_join(
            F.transform(F.slice(sorted_arr, 1, 4), lambda s: s["q"].cast("string")),
            ",",
        ).alias("first4_qty"),
        F.array_join(
            F.transform(
                F.slice(F.reverse(sorted_arr), 1, 4), lambda s: s["q"].cast("string")
            ),
            ",",
        ).alias("last4_qty"),
    )


REG.add(
    "agg_nth_first_last_values",
    _nth_values,
    """
    SELECT l_returnflag,
           (list(CAST(l_quantity AS BIGINT)
                 ORDER BY l_orderkey, l_linenumber, CAST(l_quantity AS BIGINT)))[3]
             AS nth3_qty,
           array_to_string(
             (list(CAST(l_quantity AS BIGINT)
                   ORDER BY l_orderkey, l_linenumber, CAST(l_quantity AS BIGINT)))[1:4],
             ',') AS first4_qty,
           array_to_string(
             (list(CAST(l_quantity AS BIGINT)
                   ORDER BY l_orderkey DESC, l_linenumber DESC,
                            CAST(l_quantity AS BIGINT) DESC))[1:4],
             ',') AS last4_qty
    FROM lineitem GROUP BY l_returnflag
    """,
)

# --- CUBE --------------------------------------------------------------------
def _cube(spark, sf):
    views(spark, sf)
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        """
    )


REG.add(
    "agg_cube",
    _cube,
    """
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)

# --- GROUPING SETS -----------------------------------------------------------
def _grouping_sets(spark, sf):
    views(spark, sf)
    return spark.sql(
        """
        SELECT l_returnflag, l_suppkey, COUNT(*) AS n
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_suppkey))
        """
    )


REG.add(
    "agg_grouping_sets",
    _grouping_sets,
    """
    SELECT l_returnflag, l_suppkey, COUNT(*) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_suppkey))
    """,
)

# --- salted two-phase aggregation: the skewed-key pattern --------------------
# The SaltingUtil idea applied to aggregation: when one group key dominates
# (hot key), a direct groupBy funnels that key's rows into one reducer.
# Salting splits each key into 16 sub-groups (partial agg per (key, salt)),
# then a second tiny aggregation merges the partials — both shuffles are
# uniform.  Decimal sums are associative/exact, so the result is identical
# to the direct groupBy (which is precisely what the oracle runs).
def _salted_agg(spark, sf):
    li = t(spark, sf, "lineitem")
    partial = (
        li.withColumn("_salt", F.pmod(F.xxhash64("l_orderkey"), F.lit(16)))
        .groupBy("l_returnflag", "_salt")
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.sum(dec("l_quantity")).alias("_q"),
        )
    )
    return partial.groupBy("l_returnflag").agg(
        F.sum("_n").cast("long").alias("n"),
        F.sum("_q").cast("double").alias("sum_qty"),
    )


REG.add(
    "agg_salted_skew",
    _salted_agg,
    """
    SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem GROUP BY l_returnflag
    """,
)

# --- HLL sketch algebra: partial sketches merged across groups ---------------
# The at-scale form of APPROX_COUNT_DISTINCT (reference:
# DistinctCountHyperLogLogAggregateFunction.java uses HyperLogLogPlus the
# same way): per-partition/per-group sketches are REAGGREGATABLE — build
# per-status sketches, then union them to the global estimate without
# rescanning.  Sketch bytes are engine-specific, so the oracle pins the
# REAGGREGATION CONTRACT instead: the merged estimate lands within the
# sketch error bound of the exact global distinct (deterministic for a
# fixed dataset — no RNG in the sketch).  Exact counts anchor the hash;
# the tighter estimate-vs-exact bound is also pinned in
# tests/test_sketches.py.
def _hll_merge(spark, sf):
    o = t(spark, sf, "orders")
    merged = (
        o.groupBy("o_orderstatus")
        .agg(F.hll_sketch_agg("o_custkey").alias("sk"))
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("_est"),
            F.count(F.lit(1)).cast("long").alias("n_groups"),
        )
    )
    exact = o.agg(F.countDistinct("o_custkey").cast("long").alias("exact_custkeys"))
    return merged.crossJoin(exact).select(
        "n_groups",
        "exact_custkeys",
        (
            F.abs(F.col("_est").cast("double") - F.col("exact_custkeys").cast("double"))
            <= F.col("exact_custkeys").cast("double") * F.lit(0.15)
        ).alias("merged_within_15pct"),
    )


REG.add(
    "agg_hll_sketch_merge",
    _hll_merge,
    """
    SELECT CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT) AS n_groups,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS exact_custkeys,
           true AS merged_within_15pct
    FROM orders
    """,
)

# --- APPROX_PERCENTILE (bounded-memory sketch; the 100 TB percentile path) ---
# The KLL/GK sketch value is engine-specific, so the oracle pins the rank
# CONTRACT instead: with accuracy 10000 the approximate p50/p99 must land
# between the exact p45..p55 / p97..p99.9 quantiles (rank error <= n/10000,
# so these are enormous margins — and deterministic: the sketch has no RNG).
# The exact group count anchors the hash; the exact-percentile path itself
# is value-checked by agg_percentile in aggregates.py.
REG.add(
    "agg_percentile_approx",
    lambda spark, sf: t(spark, sf, "lineitem")
    .groupBy("l_returnflag")
    .agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.percentile_approx("l_extendedprice", 0.5, 10000)
        .between(
            F.expr("percentile(l_extendedprice, 0.45)"),
            F.expr("percentile(l_extendedprice, 0.55)"),
        )
        .alias("p50_in_bounds"),
        F.percentile_approx("l_extendedprice", 0.99, 10000)
        .between(
            F.expr("percentile(l_extendedprice, 0.97)"),
            F.expr("percentile(l_extendedprice, 0.999)"),
        )
        .alias("p99_in_bounds"),
    ),
    """
    SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
           true AS p50_in_bounds, true AS p99_in_bounds
    FROM lineitem GROUP BY l_returnflag
    """,
)


# --- FILTER (WHERE ...) aggregate clause (beyond-reference; SURVEY §2.4
# notes Phoenix lacks it — ANSI FILTER is native in both Spark and DuckDB).
# Exact-decimal sums keep the doubles bit-identical across engines.
def _filter_clause(spark, sf):
    li = t(spark, sf, "lineitem")
    return li.groupBy("l_linestatus").agg(
        dsum("l_extendedprice").alias("sum_all"),
        F.sum(F.when(F.col("l_returnflag") == "R", dec("l_extendedprice")))
        .cast("double")
        .alias("sum_returned"),
        F.count(F.when(F.col("l_discount") > 0.05, F.lit(1))).alias(
            "n_discounted"
        ),
        F.max(F.when(F.col("l_tax") < 0.02, F.col("l_quantity"))).alias(
            "max_lowtax_qty"
        ),
    )


REG.add(
    "agg_filter_clause",
    _filter_clause,
    """
    SELECT l_linestatus,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_all,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
                FILTER (WHERE l_returnflag = 'R') AS DOUBLE) AS sum_returned,
           COUNT(*) FILTER (WHERE l_discount > 0.05) AS n_discounted,
           MAX(l_quantity) FILTER (WHERE l_tax < 0.02) AS max_lowtax_qty
    FROM lineitem GROUP BY l_linestatus
    """,
)

# --- WITHIN GROUP ordered-set aggregates from plain SQL ----------------------
# Round-5 sqlfront lowering (FirstValueFunction / LastValueFunction /
# NthValueFunction / PercentRankClientAggregator): the Phoenix WITHIN GROUP
# syntax flows through Engine.sql into min_by/max_by and
# array_sort(collect_list(struct)) aggregates.  o_orderkey is unique, so the
# orderings are tie-free and deterministic on both engines; prices come
# straight off the parquet scan (no arithmetic), so doubles hash-match.
def _within_group_sql(spark, sf):
    import tempfile

    from phoenix_spark.engine import Engine

    e = Engine(spark, sf_dir=sf, warehouse=tempfile.mkdtemp(prefix="phx_wh_"))
    return e.sql(
        """
        SELECT o_orderstatus,
               FIRST_VALUE(o_totalprice) WITHIN GROUP (ORDER BY o_orderkey ASC)
                 AS first_price,
               LAST_VALUE(o_totalprice) WITHIN GROUP (ORDER BY o_orderkey ASC)
                 AS last_price,
               NTH_VALUE(o_totalprice, 3) WITHIN GROUP (ORDER BY o_orderkey ASC)
                 AS third_price,
               PERCENT_RANK(100000) WITHIN GROUP (ORDER BY o_totalprice ASC)
                 AS pr_100k
        FROM orders GROUP BY o_orderstatus
        """
    )


REG.add(
    "agg_within_group_sql",
    _within_group_sql,
    """
    SELECT o_orderstatus,
           (MIN(struct_pack(o := o_orderkey, p := o_totalprice))).p AS first_price,
           (MAX(struct_pack(o := o_orderkey, p := o_totalprice))).p AS last_price,
           (list(o_totalprice ORDER BY o_orderkey))[3] AS third_price,
           CAST(COUNT(*) FILTER (WHERE o_totalprice <= 100000) AS DOUBLE)
             / COUNT(o_totalprice) AS pr_100k
    FROM orders GROUP BY o_orderstatus
    """,
)


# --- Phoenix-formula inverse-distribution aggregates (§2.4) -------------------
# The reference's PERCENTILE_CONT is NOT ANSI: PercentileClientAggregator
# interpolates at i = p*N + 0.5 over the ordered multiset (0.9 over 1..9 =
# 8.6, ANSI says 8.2), and PERCENTILE_DISC takes the first value whose
# cumulative distribution reaches p.  agg_percentile pins the ANSI surface
# (Spark/DuckDB natives); THIS entry pins the dialect front-end's
# reference-faithful lowering (sqlfront._lower_within_group), with the
# oracle computing the same formula over DuckDB list aggregates.
def _percentile_phoenix(spark, sf):
    import tempfile

    from phoenix_spark.engine import Engine

    e = Engine(spark, sf_dir=sf, warehouse=tempfile.mkdtemp(prefix="phx_wh_"))
    # p values are DYADIC (0.75 / 0.25): i = p*N + 0.5 and the interpolation
    # weights are then exactly representable doubles, so both engines produce
    # bit-identical results (a 0.9-style p would differ in the last ulp
    # between decimal-first and double-first evaluation orders)
    return e.sql(
        "SELECT l_returnflag, "
        "PERCENTILE_CONT(0.75) WITHIN GROUP (ORDER BY l_quantity ASC) AS p75, "
        "PERCENTILE_CONT(0.25) WITHIN GROUP (ORDER BY l_quantity DESC) AS p25d, "
        "CAST(PERCENTILE_DISC(0.25) WITHIN GROUP (ORDER BY l_quantity ASC) "
        "AS DOUBLE) AS d25, "
        "PERCENT_RANK(17) WITHIN GROUP (ORDER BY l_quantity ASC) AS pr17 "
        "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"
    )


REG.add(
    "agg_percentile_phoenix",
    _percentile_phoenix,
    """
    WITH g AS (
      SELECT l_returnflag,
             list_sort(list(CAST(l_quantity AS DOUBLE))) AS arr,
             count(l_quantity) AS n
      FROM lineitem GROUP BY l_returnflag
    ), c AS (
      SELECT l_returnflag, arr, n,
             list_reverse(list_sort(arr)) AS rarr,
             CAST(floor(0.75 * n + 0.5) AS BIGINT) AS k_a,
             CAST((0.75 * n + 0.5) - floor(0.75 * n + 0.5) AS DOUBLE) AS f_a,
             CAST(floor(0.25 * n + 0.5) AS BIGINT) AS k_d,
             CAST((0.25 * n + 0.5) - floor(0.25 * n + 0.5) AS DOUBLE) AS f_d
      FROM g
    )
    SELECT l_returnflag,
           CAST(CASE WHEN n = 0 THEN NULL
                WHEN k_a < 1 THEN arr[1]
                WHEN k_a >= n THEN arr[n]
                ELSE arr[k_a] * (1.0 - f_a) + arr[k_a + 1] * f_a
           END AS DOUBLE) AS p75,
           CAST(CASE WHEN n = 0 THEN NULL
                WHEN k_d < 1 THEN rarr[1]
                WHEN k_d >= n THEN rarr[n]
                ELSE rarr[k_d] * (1.0 - f_d) + rarr[k_d + 1] * f_d
           END AS DOUBLE) AS p25d,
           CAST(arr[greatest(1, CAST(ceil(0.25 * n) AS BIGINT))] AS DOUBLE)
             AS d25,
           (SELECT CAST(count(*) FILTER (WHERE q <= 17) AS DOUBLE) / count(q)
            FROM unnest(arr) AS u(q)) AS pr17
    FROM c ORDER BY l_returnflag
    """,
)
