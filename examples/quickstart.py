"""Quickstart: the SQL surface and the LLM-pipeline operators in one script.

Run from the repo root (uses the sf0.001 fixture tables):

    python examples/quickstart.py

Covers the workflow a reference user runs today — DDL, UPSERT, secondary
indexes, sequences, views, CDC — plus the dataset-curation operators a
training-data pipeline needs (dedup, quality, sampling, packing).
"""

import sys
import tempfile

sys.path.insert(0, ".")

from phoenix_spark.engine import Engine
from phoenix_spark.queries import all_queries
from phoenix_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"


def main() -> None:
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    e = Engine(spark, sf_dir=SF_DIR, warehouse=tempfile.mkdtemp(prefix="qs_wh_"))

    # -- plain SQL over the attached parquet tables -------------------------
    e.sql(
        "SELECT l_returnflag, COUNT(*) AS n, SUM(l_quantity) AS qty "
        "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"
    ).show()

    # -- DDL + mutations: change-log tables, latest wins --------------------
    e.sql(
        "CREATE TABLE hot_orders (o_orderkey BIGINT NOT NULL, "
        "o_totalprice DOUBLE, o_orderstatus VARCHAR, "
        "CONSTRAINT pk PRIMARY KEY (o_orderkey))"
    )
    n = e.sql(
        "UPSERT INTO hot_orders SELECT o_orderkey, o_totalprice, "
        "o_orderstatus FROM orders WHERE o_totalprice > 300000"
    )
    print(f"upserted {n} rows")
    e.sql("DELETE FROM hot_orders WHERE o_orderstatus = 'F'")

    # -- a covered index, used automatically --------------------------------
    e.sql("CREATE INDEX ho_price ON hot_orders (o_totalprice) INCLUDE (o_orderstatus)")
    df = e.sql(
        "SELECT o_totalprice, o_orderstatus FROM hot_orders "
        "WHERE o_totalprice > 400000"
    )
    used = any("/ho_price/segments/" in f for f in df.inputFiles())
    print(f"index used: {used}; rows: {df.count()}")

    # -- sequences + views ---------------------------------------------------
    e.sql("CREATE SEQUENCE batch_id START WITH 1000 INCREMENT BY 1")
    e.sql("CREATE VIEW open_hot AS SELECT * FROM hot_orders WHERE o_orderstatus = 'O'")
    print("view rows:", e.sql("SELECT COUNT(*) AS n FROM open_hot").collect()[0].n)
    print("next batch id:", e.sql(
        "SELECT NEXT VALUE FOR batch_id AS id FROM hot_orders LIMIT 1"
    ).collect())

    # -- LLM-pipeline operators over the documents fixture ------------------
    qs = all_queries()
    for name in (
        "dedup_minhash_lsh",      # corpus-wide near-dup pairs
        "dedup_incremental",      # arriving batch vs corpus
        "text_quality_filter",    # C4/Gopher-style gate
        "text_repetition_stats",  # n-gram repetition signals
        "sample_stratified",      # deterministic domain mix
        "text_seq_pack",          # shard-local sequence packing
        "similarity_knn_batch",   # top-k per query batch
    ):
        out = qs[name](spark, SF_DIR)
        print(f"{name}: {out.count()} rows")

    spark.stop()


if __name__ == "__main__":
    main()
