"""Joins (SURVEY.md §2.3).

Phoenix picks between a broadcast "hash" join — RHS executed, serialized and
shipped to every region server cache, probed inside the scan (reference:
phoenix-core-client/.../execute/HashJoinPlan.java:94, probe side
phoenix-core-server/.../coprocessor/HashJoinRegionScanner.java) — and a
client-side sort-merge join (.../execute/SortMergeJoinPlan.java) that handles
FULL outer.  Strategy choice lives in JoinCompiler/QueryCompiler.java:362-385;
semi/anti joins are produced from IN/EXISTS by SubqueryRewriter.

Spark mapping: `df.join(broadcast(rhs), keys, how)` is the HashJoinPlan
analogue (BroadcastHashJoin, fact side never shuffles); `hint("merge")` pins
SortMergeJoin.  At 100 TB the dimension sides here (region/nation/supplier,
and customer up to mid scale factors) stay under the 64 MB broadcast
threshold set in session.py, so the big lineitem/orders scans join
shuffle-free; the FULL-outer SMJ shuffles both sides on the key — unavoidable
and AQE-coalesced.

Test parity: HashJoinIT.java / SortMergeJoinIT.java in
phoenix-core/src/it/.../end2end/.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from phoenix_spark.queries._util import Registry, d12, dsum, t

REG = Registry()

# --- broadcast inner join, build right (HashJoinPlan default) ---------------
REG.add(
    "join_broadcast_inner",
    lambda spark, sf: t(spark, sf, "orders")
    .filter(F.col("o_orderstatus") == "F")
    .join(
        F.broadcast(t(spark, sf, "customer").filter(F.col("c_acctbal") < 0)),
        F.col("o_custkey") == F.col("c_custkey"),
        "inner",
    )
    .select(
        "o_orderkey",
        F.col("o_totalprice").cast("double").alias("o_totalprice"),
        "c_name",
        "c_mktsegment",
    ),
    """
    SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS o_totalprice,
           c_name, c_mktsegment
    FROM orders JOIN customer ON o_custkey = c_custkey
    WHERE o_orderstatus = 'F' AND c_acctbal < 0
    """,
)

# --- broadcast LEFT outer (probe preserves unmatched scan rows) -------------
REG.add(
    "join_broadcast_left",
    lambda spark, sf: t(spark, sf, "customer")
    .join(
        t(spark, sf, "orders").filter(F.col("o_totalprice") > 400000),
        F.col("c_custkey") == F.col("o_custkey"),
        "left",
    )
    .select(
        "c_custkey",
        "c_name",
        "o_orderkey",
        F.col("o_totalprice").cast("double").alias("o_totalprice"),
    ),
    """
    SELECT c_custkey, c_name, o_orderkey, CAST(o_totalprice AS DOUBLE) AS o_totalprice
    FROM customer LEFT JOIN (
      SELECT * FROM orders WHERE o_totalprice > 400000
    ) o ON c_custkey = o_custkey
    """,
)

# --- RIGHT outer = broadcast join build-left (QueryCompiler.java:491-566
# flips the join type and builds the LHS) ------------------------------------
REG.add(
    "join_right_outer",
    lambda spark, sf: t(spark, sf, "orders")
    .filter(F.col("o_orderpriority") == "1-URGENT")
    .join(
        t(spark, sf, "customer"),
        F.col("o_custkey") == F.col("c_custkey"),
        "right",
    )
    .select("c_custkey", "c_mktsegment", "o_orderkey", "o_orderpriority"),
    """
    SELECT c_custkey, c_mktsegment, o_orderkey, o_orderpriority
    FROM (SELECT * FROM orders WHERE o_orderpriority = '1-URGENT') o
    RIGHT JOIN customer ON o_custkey = c_custkey
    """,
)

# --- FULL outer via sort-merge join (SortMergeJoinPlan is Phoenix's only
# FULL-capable strategy; Spark: hint("merge") pins SMJ) ----------------------
def _full_outer(spark, sf):
    neg = t(spark, sf, "customer").filter(F.col("c_acctbal") < -500).select(
        "c_custkey", "c_name"
    )
    big = (
        t(spark, sf, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .filter(F.col("n_orders") >= 15)
    )
    return neg.hint("merge").join(
        big, neg["c_custkey"] == big["o_custkey"], "full"
    ).select("c_custkey", "c_name", "o_custkey", "n_orders")


REG.add(
    "join_sort_merge_full",
    _full_outer,
    """
    SELECT c_custkey, c_name, o_custkey, n_orders
    FROM (SELECT c_custkey, c_name FROM customer WHERE c_acctbal < -500) neg
    FULL JOIN (
      SELECT o_custkey, COUNT(*) AS n_orders FROM orders
      GROUP BY o_custkey HAVING COUNT(*) >= 15
    ) big ON neg.c_custkey = big.o_custkey
    """,
)

# --- cross join (comma-list FROM = join with null condition, grammar
# PhoenixSQL.g:1028-1030) ----------------------------------------------------
REG.add(
    "join_cross",
    lambda spark, sf: t(spark, sf, "region")
    .crossJoin(t(spark, sf, "nation"))
    .select("r_name", "n_name"),
    "SELECT r_name, n_name FROM region, nation",
)

# --- left semi (SubqueryRewriter: EXISTS → semi join) ------------------------
REG.add(
    "join_semi",
    lambda spark, sf: t(spark, sf, "customer")
    .join(
        t(spark, sf, "orders").filter(F.col("o_totalprice") > 450000),
        F.col("c_custkey") == F.col("o_custkey"),
        "left_semi",
    )
    .select("c_custkey", "c_name"),
    """
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 450000)
    """,
)

# --- left anti (SubqueryRewriter: NOT EXISTS → anti join) --------------------
REG.add(
    "join_anti",
    lambda spark, sf: t(spark, sf, "customer")
    .join(
        t(spark, sf, "orders"),
        F.col("c_custkey") == F.col("o_custkey"),
        "left_anti",
    )
    .select("c_custkey", "c_name", F.col("c_acctbal").cast("double").alias("c_acctbal")),
    """
    SELECT c_custkey, c_name, CAST(c_acctbal AS DOUBLE) AS c_acctbal
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)

# --- TPC-H Q3 shape: 3-table join + post-join agg + top-K --------------------
# Covers Phoenix's "client hash agg" (ClientAggregatePlan: aggregation over a
# join result) and the star-join single-pass (two broadcast probes in one
# scan, QueryCompiler.java:396-490).  Revenue is summed in exact decimal so
# the double bits (and hence the top-10 cut) are identical on both engines;
# l_orderkey breaks any revenue tie deterministically.
def _q3(spark, sf):
    cust = t(spark, sf, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = t(spark, sf, "orders").filter(
        F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp")
    )
    li = t(spark, sf, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1996-07-01").cast("timestamp")
    )
    one = F.lit(1).cast("decimal(12,2)")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.sum(d12("l_extendedprice") * (one - d12("l_discount")))
            .cast("double")
            .alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


REG.add(
    "q3_shipping_priority",
    _q3,
    """
    SELECT l_orderkey, o_orderdate,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
                    (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))))
                AS DOUBLE) AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1996-07-01'
      AND l_shipdate > TIMESTAMP '1996-07-01'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)

# --- TPC-H Q6 shape: forecasting revenue change (pure scan-filter-agg) ------
REG.add(
    "q6_forecast_revenue",
    lambda spark, sf: t(spark, sf, "lineitem")
    .filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount").between(0.05, 0.07))
        & (F.col("l_quantity") < 24)
    )
    .agg(
        F.sum(d12("l_extendedprice") * d12("l_discount"))
        .cast("double")
        .alias("revenue"),
        F.count(F.lit(1)).alias("n"),
    ),
    """
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
                    CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
           COUNT(*) AS n
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)

# --- TPC-H Q12 shape: orders priority by line date discipline (join + CASE
# aggregation) ----------------------------------------------------------------
REG.add(
    "q12_shipmode_priority",
    lambda spark, sf: t(spark, sf, "lineitem")
    .filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    .join(t(spark, sf, "orders"), F.col("l_orderkey") == F.col("o_orderkey"))
    .groupBy("l_returnflag")
    .agg(
        F.sum(
            F.when(
                F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1
            ).otherwise(0)
        )
        .cast("long")
        .alias("high_line_count"),
        F.sum(
            F.when(
                ~F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1
            ).otherwise(0)
        )
        .cast("long")
        .alias("low_line_count"),
    ),
    """
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1996-07-01'
    GROUP BY l_returnflag
    """,
)

# --- TPC-H Q14 shape: promotion revenue share (join + conditional ratio) ----
# The ratio of two exact decimal sums: numerator/denominator as one double
# division — bit-identical on both engines.
def _q14(spark, sf):
    one = F.lit(1).cast("decimal(12,2)")
    joined = (
        t(spark, sf, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .join(
            F.broadcast(t(spark, sf, "part")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
    )
    disc = d12("l_extendedprice") * (one - d12("l_discount"))
    return joined.agg(
        (
            F.sum(F.when(F.col("p_type").startswith("PROMO"), disc).otherwise(
                F.lit(0).cast("decimal(12,2)")
            )).cast("double")
            * 100.0
            / F.sum(disc).cast("double")
        ).alias("promo_revenue_pct")
    )


REG.add(
    "q14_promo_revenue",
    _q14,
    """
    SELECT CAST(SUM(CASE WHEN p_type LIKE 'PROMO%'
                    THEN CAST(l_extendedprice AS DECIMAL(12,2)) *
                         (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))
                    ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE) * 100.0
           / CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
                      (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))))
                  AS DOUBLE) AS promo_revenue_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-03-01'
      AND l_shipdate < TIMESTAMP '1996-04-01'
    """,
)

# --- TPC-H Q10 shape: returned-item revenue per customer (4-table join,
# multi-key group-by, top-K) — the widest "client hash agg" shape ------------
def _q10(spark, sf):
    one = F.lit(1).cast("decimal(12,2)")
    return (
        t(spark, sf, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .join(
            t(spark, sf, "orders").filter(
                (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(t(spark, sf, "customer"), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(t(spark, sf, "nation")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("c_custkey", "c_name", "n_name", "c_mktsegment")
        .agg(
            F.sum(d12("l_extendedprice") * (one - d12("l_discount")))
            .cast("double")
            .alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


REG.add(
    "q10_returned_items",
    _q10,
    """
    SELECT c_custkey, c_name, n_name, c_mktsegment,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
                    (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))))
                AS DOUBLE) AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1996-07-01'
    GROUP BY c_custkey, c_name, n_name, c_mktsegment
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)

# --- TPC-H Q5 shape: 6-table star join, dims broadcast ----------------------
# The c_nationkey = s_nationkey equi-condition ("local supplier") makes this
# the widest join in the suite; supplier/nation/region are broadcast
# explicitly, customer/orders ride AQE's choice.
def _q5(spark, sf):
    one = F.lit(1).cast("decimal(12,2)")
    return (
        t(spark, sf, "lineitem")
        .join(
            t(spark, sf, "orders").filter(
                (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(t(spark, sf, "customer"), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(t(spark, sf, "supplier")),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(
            F.broadcast(t(spark, sf, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(t(spark, sf, "region")).filter(F.col("r_name") == "ASIA"),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .groupBy("n_name")
        .agg(
            F.sum(d12("l_extendedprice") * (one - d12("l_discount")))
            .cast("double")
            .alias("revenue")
        )
    )


REG.add(
    "q5_local_supplier_volume",
    _q5,
    """
    SELECT n_name,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
                    (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))))
                AS DOUBLE) AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n_name
    """,
)


# --- NULL-safe equi-join keys (round 7, HashJoinIT/SortMergeJoinIT) ----------
# Phoenix join keys are byte-concatenated with NULL encoded as empty bytes
# (TupleUtil.getConcatenatedValue, phoenix-core-client/.../util/
# TupleUtil.java:148-176), so NULL keys MATCH NULL keys —
# HashJoinIT.testJoinMultiJoinKeys:1340 pins two NULL loc_ids joining.  The
# dialect front-end rewrites ON-clause cross-relation equalities to Spark's
# null-safe `<=>` (sqlfront._rewrite_on_nullsafe); EqualNullSafe is a
# planner-supported equi-key, so this stays a hash/sort-merge join (no
# nested-loop fallback) at any scale.
def _join_null_keys(spark, sf):
    import tempfile

    from phoenix_spark.engine import Engine

    e = Engine(spark, sf_dir=sf, warehouse=tempfile.mkdtemp(prefix="phx_wh_"))
    return e.sql(
        "SELECT COALESCE(a.k, '<null>') AS k, COUNT(*) AS cnt "
        "FROM (SELECT event_id, NULLIF(event_type, 'click') k FROM events) a "
        "JOIN (SELECT event_id, NULLIF(event_type, 'click') k FROM events) b "
        "ON a.event_id = b.event_id AND a.k = b.k "
        "GROUP BY COALESCE(a.k, '<null>')"
    )


REG.add(
    "join_null_keys",
    _join_null_keys,
    """
    SELECT COALESCE(a.k, '<null>') AS k, COUNT(*) AS cnt
    FROM (SELECT event_id, NULLIF(event_type, 'click') k FROM events) a
    JOIN (SELECT event_id, NULLIF(event_type, 'click') k FROM events) b
      ON a.event_id = b.event_id AND a.k IS NOT DISTINCT FROM b.k
    GROUP BY COALESCE(a.k, '<null>')
    """,
)

# --- FULL outer + non-equi residual ON condition (round 7) -------------------
# SortMergeJoinPlan evaluates non-key ON conditions per merged pair; rows
# failing the residual NULL-extend on BOTH sides.  Spark's SMJ supports a
# join condition alongside the keys natively — both sides shuffle once on
# the key, the residual is evaluated streamside (no extra pass).
REG.add(
    "join_full_nonequi_residual",
    lambda spark, sf: t(spark, sf, "nation")
    .join(
        t(spark, sf, "region"),
        (F.col("n_regionkey") == F.col("r_regionkey"))
        & (F.col("n_nationkey") > 10),
        "full",
    )
    .select("n_name", "n_nationkey", "r_name"),
    """
    SELECT n_name, n_nationkey, r_name
    FROM nation FULL JOIN region
      ON n_regionkey = r_regionkey AND n_nationkey > 10
    """,
)
