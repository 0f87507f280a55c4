"""Beyond-reference join extensions (SURVEY.md §2.3 "NOT implemented in
reference" row): as-of join and range join.

Phoenix has neither; both are table stakes for time-series / feature-store
workloads, so the engine declares them as extension surface with
shuffle-bounded plans:

  * AS-OF join — "for each left row, the latest right row with ts <= left
    ts, per key".  NOT a sort-merge band join: implemented as union + tagged
    window carry-forward (one shuffle on the key, one per-partition sort —
    the same cost as a plain window).  DuckDB has native ASOF JOIN, giving a
    true semantic oracle.
  * Range join — equi-join on overlapping *buckets* + exact residual filter,
    never a broadcast-nested-loop/cartesian theta join (plan-asserted in
    tests/test_plans.py).  Bucket width chosen so each probe row explodes to
    a constant (2) candidate buckets.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from phoenix_spark.queries._util import Registry, t

REG = Registry()

# --- AS-OF join: each click/view event matched to the user's most recent
# prior-or-equal 'signup' event ------------------------------------------------
def _asof(spark, sf):
    ev = t(spark, sf, "events")
    left = ev.filter(F.col("event_type").isin("click", "view")).select(
        "event_id", "user_id", "ts", "event_type"
    )
    right = ev.filter(F.col("event_type") == "signup").select(
        "user_id", F.col("ts").alias("signup_ts")
    )
    # union with a tag; within equal ts the right side sorts first so
    # ts_left == ts_right matches (ASOF >= semantics)
    tagged = left.select(
        "user_id",
        F.col("ts").alias("ord_ts"),
        F.lit(1).alias("tag"),
        "event_id",
        "ts",
        "event_type",
        F.lit(None).cast("timestamp_ntz").alias("signup_ts"),
    ).unionByName(
        right.select(
            "user_id",
            F.col("signup_ts").alias("ord_ts"),
            F.lit(0).alias("tag"),
            F.lit(None).cast("long").alias("event_id"),
            F.lit(None).cast("timestamp_ntz").alias("ts"),
            F.lit(None).cast("string").alias("event_type"),
            "signup_ts",
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ord_ts", "tag")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        tagged.withColumn(
            "matched_signup_ts", F.last("signup_ts", ignorenulls=True).over(w)
        )
        .filter(F.col("tag") == 1)
        .select("event_id", "user_id", "ts", "event_type", "matched_signup_ts")
    )


REG.add(
    "join_asof",
    _asof,
    """
    SELECT l.event_id, l.user_id, l.ts, l.event_type,
           r.signup_ts AS matched_signup_ts
    FROM (SELECT event_id, user_id, ts, event_type FROM events
          WHERE event_type IN ('click', 'view')) l
    ASOF LEFT JOIN (SELECT user_id, ts AS signup_ts FROM events
                    WHERE event_type = 'signup') r
      ON l.user_id = r.user_id AND l.ts >= r.signup_ts
    """,
)

# --- bucketed range join: events matched to value-band rows ------------------
# Each lineitem joins parts whose retail price lies within ±25 of its
# extended-price/100.  Bucket width = 50 → probe explodes to exactly 2
# candidate buckets; the equi-join on (bucket) carries the candidates and the
# exact band predicate filters residually.
_W = 50


def _range_join(spark, sf):
    li = (
        t(spark, sf, "lineitem")
        .filter(F.col("l_orderkey") <= 400)
        .select(
            "l_orderkey",
            "l_linenumber",
            (F.col("l_extendedprice") / 100).alias("target"),
        )
    )
    # The band is exactly one bucket wide, so the two candidate buckets are
    # always distinct consecutive integers — explode emits no duplicates.
    probe = li.withColumn(
        "bucket",
        F.explode(
            F.array(
                F.floor((F.col("target") - _W / 2) / _W),
                F.floor((F.col("target") + _W / 2) / _W),
            )
        ),
    )
    build = t(spark, sf, "part").select(
        "p_partkey", F.col("p_retailprice").alias("price")
    ).withColumn("bucket", F.floor(F.col("price") / _W))
    return (
        probe.join(build, "bucket")
        .filter(
            (F.col("price") >= F.col("target") - _W / 2)
            & (F.col("price") <= F.col("target") + _W / 2)
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            "p_partkey",
            F.col("price").cast("double").alias("price"),
        )
    )


REG.add(
    "join_range_bucketed",
    _range_join,
    f"""
    SELECT l_orderkey, l_linenumber, p_partkey,
           CAST(p_retailprice AS DOUBLE) AS price
    FROM (SELECT l_orderkey, l_linenumber, l_extendedprice / 100 AS target
          FROM lineitem WHERE l_orderkey <= 400) l
    JOIN part ON p_retailprice >= target - {_W / 2}
             AND p_retailprice <= target + {_W / 2}
    """,
)
