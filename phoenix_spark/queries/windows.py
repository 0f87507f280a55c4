"""Window functions (SURVEY.md §2.5 — declared beyond-reference surface).

Phoenix has NO window functions (no OVER in PhoenixSQL.g:20-172); its nearest
analogues are the ordered-set aggregates (FIRST_VALUE/NTH_VALUE, pinned in
aggregates.py).  The PySpark engine declares ranking/frame windows as
extension surface — they're also the substrate for the LLM-pipeline
sessionization and CDC pre/post-image operators (SURVEY §2.11).

Scale: every window here partitions by a key (customer / user) — one shuffle
on the partition key, then per-partition sort; no global sort, no driver
collection.  Running sums use exact DECIMAL so the hashed doubles match the
oracle bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from phoenix_spark.queries._util import Registry, dec, t

REG = Registry()

# --- ranking: row_number / rank / dense_rank, top-N per group ----------------
def _rank_topn(spark, sf):
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        t(spark, sf, "orders")
        .select(
            "o_custkey",
            "o_orderkey",
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rk"),
            F.dense_rank().over(w).alias("drk"),
        )
        .filter(F.col("rn") <= 3)
    )


REG.add(
    "window_rank_topn",
    _rank_topn,
    """
    SELECT * FROM (
      SELECT o_custkey, o_orderkey, CAST(o_totalprice AS DOUBLE) AS o_totalprice,
             row_number() OVER w AS rn,
             rank()       OVER w AS rk,
             dense_rank() OVER w AS drk
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    ) x WHERE rn <= 3
    """,
)

# --- running aggregate + lag/lead over an explicit frame ---------------------
def _running(spark, sf):
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    frame = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return t(spark, sf, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.sum(dec("o_totalprice")).over(frame).cast("double").alias("run_total"),
        F.lag("o_orderdate", 1).over(w).alias("prev_date"),
        F.lead("o_orderdate", 1).over(w).alias("next_date"),
        F.count(F.lit(1)).over(frame).alias("order_seq"),
    )


REG.add(
    "window_running_lag",
    _running,
    """
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w_frame AS DOUBLE)
             AS run_total,
           lag(o_orderdate, 1)  OVER w AS prev_date,
           lead(o_orderdate, 1) OVER w AS next_date,
           COUNT(*) OVER w_frame AS order_seq
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
           w_frame AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)

# --- sessionization: 30-minute inactivity gap (the Structured-Streaming
# session_window analogue, computed batch-side with lag + running sum) --------
def sessionize(ev, gap_minutes: int = 30):
    """Session assignment over any (user_id, event_id, ts) DataFrame: a new
    session starts after ``gap_minutes`` of inactivity.  Exposed for reuse
    (and the property-based model check in tests/test_window_properties.py).
    """
    from phoenix_spark.functions import ntz_epoch_micros_sql

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev = ev.select(
        # ts reads as TIMESTAMP_NTZ (naive parquet micros); the epoch
        # derivation must not route it through the session timezone (a
        # non-UTC driver would shift gaps across DST transitions)
        "user_id", "event_id", "ts",
        F.expr(ntz_epoch_micros_sql("ts")).alias("us"),
    )
    gap = F.col("us") - F.lag("us", 1).over(w)
    sess = ev.withColumn(
        "new_sess",
        F.when(gap.isNull() | (gap > gap_minutes * 60 * 1_000_000), 1).otherwise(0),
    ).withColumn(
        "session_id",
        F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        sess.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
    )


def _sessionize(spark, sf):
    return sessionize(t(spark, sf, "events"))


REG.add(
    "window_sessionize",
    _sessionize,
    """
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id, COUNT(*) AS n_events,
           MIN(ts) AS session_start, MAX(ts) AS session_end
    FROM (
      SELECT user_id, ts,
             SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS session_id
      FROM (
        SELECT user_id, event_id, ts,
               CASE WHEN epoch_us(ts) - lag(epoch_us(ts), 1)
                      OVER (PARTITION BY user_id ORDER BY ts, event_id)
                    IS NULL THEN 1
                    WHEN epoch_us(ts) - lag(epoch_us(ts), 1)
                      OVER (PARTITION BY user_id ORDER BY ts, event_id)
                      > 30 * 60 * 1000000 THEN 1
                    ELSE 0 END AS new_sess
        FROM events) g
    ) s
    GROUP BY user_id, session_id
    """,
)

# --- NTH_VALUE / FIRST_VALUE / LAST_VALUE as true window variants ------------
# (Phoenix's NthValueFunction is an ordered-set aggregate; the window form is
# the Spark-native superset.)
def _nth(spark, sf):
    w = (
        Window.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        t(spark, sf, "lineitem")
        .filter(F.col("l_suppkey") <= 5)
        .select(
            "l_suppkey",
            "l_orderkey",
            "l_linenumber",
            F.first_value(F.col("l_extendedprice")).over(w).cast("double").alias(
                "first_price"
            ),
            F.last_value(F.col("l_extendedprice")).over(w).cast("double").alias(
                "last_price"
            ),
            F.nth_value(F.col("l_extendedprice"), 2).over(w).cast("double").alias(
                "second_price"
            ),
        )
    )


REG.add(
    "window_first_last_nth",
    _nth,
    """
    SELECT l_suppkey, l_orderkey, l_linenumber,
           CAST(first_value(l_extendedprice) OVER w AS DOUBLE) AS first_price,
           CAST(last_value(l_extendedprice)  OVER w AS DOUBLE) AS last_price,
           CAST(nth_value(l_extendedprice, 2) OVER w AS DOUBLE) AS second_price
    FROM lineitem
    WHERE l_suppkey <= 5
    WINDOW w AS (PARTITION BY l_suppkey
                 ORDER BY l_shipdate, l_orderkey, l_linenumber
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)


# --- distribution windows: ntile / cume_dist / percent_rank ------------------
# The remaining ANSI ranking family (beyond-reference, like all of §2.5).
# Ties: the ORDER BY includes the unique o_orderkey suffix ONLY for ntile
# (bucket assignment needs a total order to be deterministic); cume_dist and
# percent_rank deliberately run on the non-unique price alone so their
# tie-group semantics (counts of peers) are what's pinned.
def _dist_windows(spark, sf):
    wt = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    wp = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc())
    return t(spark, sf, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.ntile(4).over(wt).alias("quartile"),
        F.cume_dist().over(wp).alias("cd"),
        F.percent_rank().over(wp).alias("pr"),
    )


REG.add(
    "window_dist_ntile",
    _dist_windows,
    """
    SELECT o_custkey, o_orderkey,
           ntile(4)       OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS quartile,
           cume_dist()    OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC)             AS cd,
           percent_rank() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC)             AS pr
    FROM orders
    """,
)


# --- native session_window (the Structured-Streaming operator, batch mode) ---
# Pins Spark's built-in session_window against the same gap rule the
# lag-based sessionize oracle uses: empirically (and per the window-merge
# semantics) an event exactly AT prev_ts + gap merges into the session, so
# a new session starts strictly beyond the gap — identical to the `>` lag
# rule.  Window end = last event + gap.  This is the §2.11 streaming
# operator made hash-verifiable in batch.
def _session_native(spark, sf):
    return (
        t(spark, sf, "events")
        .groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("s_start"),
            F.col("session_window.end").alias("s_end"),
            "n_events",
        )
    )


REG.add(
    "window_session_native",
    _session_native,
    """
    SELECT user_id,
           MIN(ts)                       AS s_start,
           MAX(ts) + INTERVAL 30 MINUTE  AS s_end,
           COUNT(*)                      AS n_events
    FROM (
      SELECT user_id, ts,
             SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS session_id
      FROM (
        SELECT user_id, event_id, ts,
               CASE WHEN epoch_us(ts) - lag(epoch_us(ts), 1)
                      OVER (PARTITION BY user_id ORDER BY ts, event_id)
                    IS NULL THEN 1
                    WHEN epoch_us(ts) - lag(epoch_us(ts), 1)
                      OVER (PARTITION BY user_id ORDER BY ts, event_id)
                      > 30 * 60 * 1000000 THEN 1
                    ELSE 0 END AS new_sess
        FROM events) g
    ) s
    GROUP BY user_id, session_id
    """,
)
