"""Scale smoke: replicate the fixtures 10x and compare wall times AND
LSH candidate-pair volumes vs sf0.1 — the evidence that the plans (and the
LSH banding constants) scale near-linearly on fixed cores.

Replication is decorrelated so 10x the rows means ~10x the dup clusters,
not 100x cross-copy duplicate pairs:
  * lineitem/orders: keys shifted per copy (join cardinalities scale).
  * documents: every token gets a per-copy prefix (c0 keeps the original),
    so shingles/tokens never match across copies — each copy carries its own
    dup clusters.
  * embeddings: each copy is multiplied by a per-copy deterministic ±1
    sign mask — intra-copy dot products are EXACTLY preserved (the mask
    cancels: (s*a)·(s*b) = a·b) while cross-copy dots sign-mix toward 0.
    (A dimension rotation was tried first and does NOT decorrelate: the
    fixture's embedding distribution is anisotropic, so rotated copies stay
    correlated and candidate growth measured quadratic.)

LSH candidate volume is THE scale contract: candidates(10x)/candidates(1x)
should sit near 10, not 100.  Where a fixture-tuned band key saturates
(sign-LSH 8-bit keys), the parameterized config from sign_lsh_params /
simhash_params is measured alongside to show the knob restoring linearity.
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from phoenix_spark.session import get_spark
from phoenix_spark.queries import all_queries

SRC = "/root/testdata/sf0.1"
DST = "/tmp/sf1ish"

spark = get_spark()
spark.sparkContext.setLogLevel("ERROR")

if not os.path.exists(f"{DST}/_done"):
    copies = spark.range(10).select(F.col("id").alias("copy"))
    # 10x facts; orderkeys shifted per copy so join cardinalities scale too
    li = spark.read.parquet(f"{SRC}/lineitem.parquet")
    od = spark.read.parquet(f"{SRC}/orders.parquet")
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
    # 10x documents, token-prefixed per copy (copy 0 unchanged)
    doc = spark.read.parquet(f"{SRC}/documents.parquet")
    (
        doc.crossJoin(copies)
        .withColumn(
            "text",
            F.when(F.col("copy") == 0, F.col("text")).otherwise(
                F.regexp_replace(
                    F.col("text"),
                    F.lit(r"(\S+)"),
                    F.concat(F.lit("c"), F.col("copy"), F.lit("$1")),
                )
            ),
        )
        .withColumn("doc_id", F.col("doc_id") + F.col("copy") * 10_000_000)
        .drop("copy")
        .repartition(32)
        .write.mode("overwrite")
        .parquet(f"{DST}/documents.parquet")
    )
    # 10x embeddings, per-copy ±1 sign mask (copy 0 unchanged).  The mask
    # mix constants deliberately DIFFER from pipeline_similarity._PARITY's
    # (2654435761/40503): reusing them would make mask c identical to LSH
    # hyperplane c, correlating the replication with the very band keys the
    # probe measures.
    emb = spark.read.parquet(f"{SRC}/embeddings.parquet")
    (
        emb.crossJoin(copies)
        .withColumn(
            "embedding",
            F.expr(
                "transform(embedding, (x, i) -> CASE WHEN copy = 0 THEN x"
                " WHEN pmod((i + 1) * 2246822519 + copy * 668265263, 65536)"
                " < 32768 THEN x ELSE -x END)"
            ),
        )
        .withColumn("vec_id", F.col("vec_id") + F.col("copy") * 10_000_000)
        .drop("copy")
        .repartition(32)
        .write.mode("overwrite")
        .parquet(f"{DST}/embeddings.parquet")
    )
    for tbl in ["region", "nation", "customer", "supplier", "part", "events"]:
        spark.read.parquet(f"{SRC}/{tbl}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{DST}/{tbl}.parquet")
    open(f"{DST}/_done", "w").write("ok")
    print("built 10x dataset")

qs = all_queries()


def bench(fn, sf_dir):
    t0 = time.perf_counter()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


print("== headline wall times (sf0.1 vs 10x) ==")
for name in ["q1_pricing_summary", "q3_shipping_priority", "agg_groupby_hash",
             "q9_product_profit", "sort_topk", "filter_range_pred",
             "dedup_minhash_lsh", "dedup_simhash", "dedup_simhash128",
             "similarity_lsh_pairs",
             "text_repetition_stats", "assembly_mix_report",
             "text_decontaminate", "dedup_incremental", "similarity_knn_batch"]:
    a = bench(qs[name], SRC)
    b = bench(qs[name], DST)
    print(f"{name}: sf0.1={a:.2f}s 10x={b:.2f}s ratio={b/a:.1f}x")

print("== LSH candidate-pair volume (pre-verify; growth contract) ==")
from phoenix_spark.queries.pipeline_dedup import _minhash_lsh, _simhash
from phoenix_spark.queries.pipeline_similarity import _lsh_pairs, sign_lsh_params

N_EMB_10X = spark.read.parquet(f"{DST}/embeddings.parquet").count()
wide_planes, wide_bands = sign_lsh_params(N_EMB_10X)

probes = [
    ("minhash_lsh", lambda s, d: _minhash_lsh(s, d, candidates_only=True)),
    ("simhash 64/4 (16-bit buckets)",
     lambda s, d: _simhash(s, d, 64, 4, candidates_only=True)),
    ("simhash 128/8 (16-bit buckets)",
     lambda s, d: _simhash(s, d, 128, 8, candidates_only=True)),
    ("simhash 128/4 (32-bit buckets)",
     lambda s, d: _simhash(s, d, 128, 4, candidates_only=True)),
    ("sign-LSH 8x8 (fixture-era config)",
     lambda s, d: _lsh_pairs(s, d, 64, 8, candidates_only=True)),
    ("sign-LSH 8x11 (registered: sign_lsh_params(2000))",
     lambda s, d: _lsh_pairs(s, d, candidates_only=True)),
    (f"sign-LSH {wide_bands}x{wide_planes // wide_bands}"
     f" (sign_lsh_params(N={N_EMB_10X}))",
     lambda s, d: _lsh_pairs(s, d, wide_planes, wide_bands,
                             candidates_only=True)),
    ("sign-LSH 32x20 (high-threshold near-dup regime)",
     lambda s, d: _lsh_pairs(s, d, 640, 32, candidates_only=True)),
]
for label, fn in probes:
    c1 = fn(spark, SRC).count()
    c10 = fn(spark, DST).count()
    ratio = c10 / max(c1, 1)
    print(f"{label}: cand(1x)={c1} cand(10x)={c10} growth={ratio:.1f}x")

# The denominator of the overhead ratio: how many TRUE pairs (cos >= 0.4)
# exist?  If the answer itself grows quadratically (this fixture's cosine
# bulk sits near the threshold), any correct pair enumerator is Ω(answer) —
# the LSH knob controls candidates-per-emitted-pair, not the exponent.
o1 = _lsh_pairs(spark, SRC).count()
o10 = _lsh_pairs(spark, DST).count()
print(f"sign-LSH verified output pairs: 1x={o1} 10x={o10}"
      f" growth={o10 / max(o1, 1):.1f}x")
