"""Source-side extensions (SURVEY.md §2.1 tail): CSV bulk load and dynamic
columns, each behind a value-hash oracle.

  * CSV bulk load — CsvBulkLoadTool analogue (reference:
    phoenix-core-server/.../mapreduce/CsvBulkLoadTool): fixture rows are
    round-tripped through a CSV file into a managed table; the oracle is the
    equivalent straight SELECT, so any encode/parse drift fails the hash.
  * Dynamic columns — `SELECT * FROM t (k BIGINT)` (grammar
    PhoenixSQL.g:832-855): a query-time typed column resolved from the JSON
    overflow column (events.props), the schema-on-read escape hatch.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from phoenix_spark.queries._util import Registry

REG = Registry()


def _engine(spark, sf):
    from phoenix_spark.engine import Engine

    return Engine(spark, sf_dir=sf, warehouse=tempfile.mkdtemp(prefix="phx_wh_"))


def _csv_bulk_load(spark, sf):
    e = _engine(spark, sf)
    e.sql(
        "CREATE TABLE cust_csv (c_custkey BIGINT NOT NULL, c_name VARCHAR, "
        "c_acctbal DOUBLE, CONSTRAINT pk PRIMARY KEY (c_custkey))"
    )
    csv_dir = tempfile.mkdtemp(prefix="phx_csv_") + "/cust"
    (
        e.table("customer")
        .filter(F.col("c_custkey") <= 200)
        .select("c_custkey", "c_name", "c_acctbal")
        .write.option("header", True)
        .csv(csv_dir)
    )
    e.bulk_load_csv("cust_csv", csv_dir)
    return e.table("cust_csv").select(
        "c_custkey", "c_name", F.col("c_acctbal").cast("double").alias("c_acctbal")
    )


REG.add(
    "source_csv_bulk_load",
    _csv_bulk_load,
    """
    SELECT c_custkey, c_name, CAST(c_acctbal AS DOUBLE) AS c_acctbal
    FROM customer WHERE c_custkey <= 200
    """,
)


def _dynamic_columns(spark, sf):
    e = _engine(spark, sf)
    # UPSERT-side dynamic columns (grammar :927-931 upsert_column_refs):
    # a typed column outside the schema writes into the JSON overflow column
    # and round-trips through the SELECT-side dynamic resolution.  Pinned
    # here as a loud assert so the driver row covers both directions.
    e.sql(
        "CREATE TABLE dyn_rt (id BIGINT NOT NULL, props VARCHAR, "
        "CONSTRAINT pk PRIMARY KEY (id))"
    )
    e.sql("UPSERT INTO dyn_rt (id, score BIGINT) VALUES (1, 41), (2, 99)")
    got = {
        r.id: r.score
        for r in e.sql(
            "SELECT id, score FROM dyn_rt (score BIGINT)"
        ).collect()
    }
    assert got == {1: 41, 2: 99}, f"dynamic-column upsert round-trip: {got}"
    return (
        e.table("events", dyn_cols={"k": "BIGINT"})
        .filter(F.col("k") > 90)
        .select("event_id", "event_type", "k")
    )


REG.add(
    "source_dynamic_columns",
    _dynamic_columns,
    """
    SELECT event_id, event_type,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
    FROM events
    WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) > 90
    """,
)
