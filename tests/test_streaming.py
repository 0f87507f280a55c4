"""Structured Streaming surface tests (§2.11): CDC stream, CDC apply,
watermarked windows, session windows, TTL view.

Reference test parity: phoenix-core/src/it/.../end2end/CDCQueryIT.java
(change feed contents) — replayed here against the streaming source with an
availableNow trigger so runs are bounded."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from tests.conftest import SF_TEST_DIR


@pytest.fixture()
def engine(spark, tmp_path):
    from phoenix_spark.engine import Engine

    return Engine(spark, sf_dir=SF_TEST_DIR, warehouse=str(tmp_path / "wh"))


def test_stream_changes_cdc_feed(engine, spark, tmp_path):
    from phoenix_spark.streaming import stream_changes

    engine.sql("CREATE TABLE st (k BIGINT NOT NULL, v VARCHAR, CONSTRAINT pk PRIMARY KEY (k))")
    engine.sql("UPSERT INTO st VALUES (1, 'a'), (2, 'b')")
    engine.sql("UPSERT INTO st VALUES (2, 'b2')")
    engine.sql("DELETE FROM st WHERE k = 1")

    q = (
        stream_changes(spark, engine.managed("st"))
        .writeStream.format("memory")
        .queryName("cdc_sink")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(60)
    rows = spark.sql("SELECT * FROM cdc_sink ORDER BY change_ts, k").collect()
    ops = [(r.k, r.change_op) for r in rows]
    assert ops == [(1, "UPSERT"), (2, "UPSERT"), (2, "UPSERT"), (1, "DELETE")]


def test_apply_changes_replicates_table(engine, spark, tmp_path):
    from phoenix_spark.mutations import ManagedTable
    from phoenix_spark.streaming import apply_changes

    engine.sql("CREATE TABLE src (k BIGINT NOT NULL, v BIGINT, CONSTRAINT pk PRIMARY KEY (k))")
    engine.sql("UPSERT INTO src VALUES (1, 10), (2, 20), (3, 30)")
    engine.sql("UPSERT INTO src VALUES (2, 22)")
    engine.sql("DELETE FROM src WHERE k = 3")

    src = engine.managed("src")
    tgt = ManagedTable.create(
        spark, engine.warehouse, "tgt", src.schema, src.pk
    )
    q = apply_changes(spark, src, tgt, str(tmp_path / "ckpt2"))
    q.awaitTermination(120)
    got = {r.k: r.v for r in tgt.read().collect()}
    assert got == {1: 10, 2: 22}


def test_windowed_counts_matches_batch(engine, spark):
    from phoenix_spark.catalog import read_table
    from phoenix_spark.streaming import windowed_counts

    ev = read_table(spark, f"{SF_TEST_DIR}/events.parquet")
    got = windowed_counts(ev, window="1 hour").orderBy("window_start", "event_type")
    batch = (
        ev.groupBy(F.window("ts", "1 hour"), "event_type")
        .count()
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            F.col("count").alias("n"),
        )
    )
    a = {(r.window_start, r.event_type): r.n for r in got.collect()}
    b = {(r.window_start, r.event_type): r.n for r in batch.collect()}
    assert a == b and len(a) > 0


def test_session_window_bounds(spark):
    from phoenix_spark.catalog import read_table
    from phoenix_spark.streaming import sessionized

    ev = read_table(spark, f"{SF_TEST_DIR}/events.parquet")
    sess = sessionized(ev, gap="30 minutes").collect()
    assert sess
    for r in sess:
        assert r.session_end > r.session_start and r.n_events >= 1


def test_ttl_view_retention(spark):
    from phoenix_spark.catalog import read_table
    from phoenix_spark.streaming import ttl_view

    ev = read_table(spark, f"{SF_TEST_DIR}/events.parquet")
    horizon = ev.agg(F.max("ts")).collect()[0][0]
    kept = ttl_view(
        ev, "ts", "6 HOURS", f"TIMESTAMP '{horizon}'"
    )
    n_all, n_kept = ev.count(), kept.count()
    assert 0 < n_kept < n_all
    oldest = kept.agg(F.min("ts")).collect()[0][0]
    assert (horizon - oldest).total_seconds() <= 6 * 3600


def test_stateful_user_stats(spark, tmp_path):
    import pyarrow.parquet as pq
    import pyarrow as pa
    from phoenix_spark.streaming import stateful_user_stats

    # a small nanos-free copy of events so readStream can infer cleanly
    from phoenix_spark.catalog import read_table

    src = str(tmp_path / "ev_us")
    read_table(spark, f"{SF_TEST_DIR}/events.parquet").filter(
        "user_id < 40"  # keep the state-store group count small: the pin is
        # semantics (state carried per key), not throughput
    ).select("user_id", "ts", "value").write.parquet(src)
    stream = spark.readStream.schema("user_id bigint, ts timestamp, value double").parquet(src)
    q = (
        stateful_user_stats(stream)
        .writeStream.format("memory")
        .queryName("user_stats")
        .outputMode("update")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt_state"))
        .start()
    )
    q.awaitTermination(120)
    got = {r.user_id: (r.n_events, round(r.total_value, 6)) for r in spark.sql(
        "SELECT * FROM user_stats"
    ).collect()}
    from pyspark.sql import functions as F
    want = {
        r.user_id: (r.n, round(r.total, 6))
        for r in read_table(spark, f"{SF_TEST_DIR}/events.parquet")
        .filter("user_id < 40")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
        .collect()
    }
    assert got == want and len(got) > 0


def test_compact_with_ttl_expires_rows(engine, spark):
    from phoenix_spark.streaming import compact_with_ttl

    engine.sql(
        "CREATE TABLE ttl_t (k BIGINT NOT NULL, ts TIMESTAMP, "
        "CONSTRAINT pk PRIMARY KEY (k))"
    )
    engine.sql(
        "UPSERT INTO ttl_t VALUES (1, TIMESTAMP '2024-01-01 00:00:00'), "
        "(2, TIMESTAMP '2024-01-09 00:00:00'), (3, TIMESTAMP '2024-01-10 00:00:00')"
    )
    mt = engine.managed("ttl_t")
    compact_with_ttl(mt, "ts", "2 DAYS", "TIMESTAMP '2024-01-10 00:00:00'")
    assert sorted(r.k for r in mt.read().collect()) == [2, 3]
    assert len(mt._segments()) == 1  # history physically reclaimed


def test_watermark_drops_late_rows_across_batches(spark, tmp_path):
    """True streaming late-data semantics: with a 1-hour watermark in append
    mode, a window only emits once the watermark passes it, and a row
    arriving after that is dropped (§2.11 late-data contract)."""
    import os
    from phoenix_spark.streaming import windowed_counts

    src = str(tmp_path / "late_src")
    os.makedirs(src)

    def _write(tag, rows):
        # one file per micro-batch so maxFilesPerTrigger=1 gives a
        # deterministic batch sequence (file source orders by mod time)
        import time

        spark.createDataFrame(
            rows, "user_id long, ts_s string, event_type string"
        ).selectExpr(
            "user_id", "CAST(ts_s AS TIMESTAMP) AS ts", "event_type"
        ).coalesce(1).write.parquet(os.path.join(src, tag))
        time.sleep(1.1)

    _write("b=1", [(1, "2024-01-01 00:10:00", "click"), (2, "2024-01-01 00:20:00", "click")])
    # advances the watermark to 05:00...
    _write("b=2", [(3, "2024-01-01 06:00:00", "click")])
    # ...and eviction/emission happen at the END of the batch running under
    # that watermark, so one more advancing batch closes the first window
    _write("b=3", [(5, "2024-01-01 07:00:00", "click")])
    # LATE for the closed window — must be dropped
    _write("b=4", [(4, "2024-01-01 00:30:00", "click")])

    stream = (
        spark.readStream.schema("user_id long, ts timestamp, event_type string")
        .option("maxFilesPerTrigger", "1")
        .option("latestFirst", "false")
        .parquet(src + "/b=*")
    )
    q = (
        windowed_counts(stream, window="1 hour", watermark="1 hour")
        .writeStream.format("memory")
        .queryName("late_sink")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt_late"))
        .start()
    )
    q.awaitTermination(180)
    rows = {
        (r.window_start.isoformat(), r.n)
        for r in spark.sql("SELECT * FROM late_sink").collect()
    }
    # the 00:00 window closed with ONLY the two on-time rows; the late row
    # (user 4) was discarded by the watermark, visibly in the metrics
    assert ("2024-01-01T00:00:00", 2) in rows
    assert not any(n == 3 for _, n in rows)
    dropped = sum(
        p["stateOperators"][0].get("numRowsDroppedByWatermark", 0)
        for p in q.recentProgress
    )
    assert dropped == 1


def test_stream_dedup_within_watermark(spark, tmp_path):
    import os
    from phoenix_spark.streaming import stream_dedup

    src = str(tmp_path / "dup_src")
    os.makedirs(src)
    spark.createDataFrame(
        [
            (1, "2024-01-01 00:10:00"),
            (1, "2024-01-01 00:12:00"),  # duplicate key within horizon
            (2, "2024-01-01 00:20:00"),
        ],
        "event_id long, ts_s string",
    ).selectExpr("event_id", "CAST(ts_s AS TIMESTAMP) AS ts").coalesce(1).write.parquet(
        os.path.join(src, "b=1")
    )
    q = (
        stream_dedup(
            spark.readStream.schema("event_id long, ts timestamp").parquet(src + "/b=*"),
            keys=["event_id"],
        )
        .writeStream.format("memory")
        .queryName("dedup_sink")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt_dd"))
        .start()
    )
    q.awaitTermination(120)
    got = sorted(r.event_id for r in spark.sql("SELECT * FROM dedup_sink").collect())
    assert got == [1, 2]
