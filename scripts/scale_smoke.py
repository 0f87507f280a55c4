"""Scale smoke: replicate lineitem/orders 10x (with shifted keys so joins
stay realistic) and compare headline query wall times vs sf0.1 — evidence
that the plans scale near-linearly on fixed cores."""

import sys, time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from phoenix_spark.session import get_spark
from phoenix_spark.queries import all_queries

SRC = "/root/testdata/sf0.1"
DST = "/tmp/sf1ish"

spark = get_spark()
spark.sparkContext.setLogLevel("ERROR")

import os

if not os.path.exists(f"{DST}/_done"):
    # 10x replication; orderkeys shifted per copy so cardinalities scale too
    li = spark.read.parquet(f"{SRC}/lineitem.parquet")
    od = spark.read.parquet(f"{SRC}/orders.parquet")
    copies = spark.range(10).select(F.col("id").alias("copy"))
    (
        li.crossJoin(copies)
        .withColumn("l_orderkey", F.col("l_orderkey") + F.col("copy") * 10_000_000)
        .drop("copy")
        .repartition(32)
        .write.mode("overwrite")
        .parquet(f"{DST}/lineitem.parquet")
    )
    (
        od.crossJoin(copies)
        .withColumn("o_orderkey", F.col("o_orderkey") + F.col("copy") * 10_000_000)
        .drop("copy")
        .repartition(32)
        .write.mode("overwrite")
        .parquet(f"{DST}/orders.parquet")
    )
    for tbl in ["region", "nation", "customer", "supplier", "part",
                "events", "documents", "embeddings"]:
        spark.read.parquet(f"{SRC}/{tbl}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{DST}/{tbl}.parquet")
    open(f"{DST}/_done", "w").write("ok")
    print("built 10x dataset")

qs = all_queries()


def bench(name, sf_dir):
    t0 = time.perf_counter()
    qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


for name in ["q1_pricing_summary", "q3_shipping_priority", "agg_groupby_hash",
             "q9_product_profit", "sort_topk", "filter_range_pred"]:
    a = bench(name, SRC)
    b = bench(name, DST)
    print(f"{name}: sf0.1={a:.2f}s 10x={b:.2f}s ratio={b/a:.1f}x")
