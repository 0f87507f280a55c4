#!/usr/bin/env python3
"""Round-9 CPU decompositions (VERDICT next-round items 1, 3, 4).

Isolates, on executor CPU time (stages API; UI enabled on port 4050):
  1. the shared tokenize+shingle+md5 map (dedup/decontaminate/assemble):
     per-element split of HOF-lambda share vs md5 share.
  2. the interpreted cosine folds (similarity lsh verify / knn / ivf).
  3. text_decontaminate's exploded join stages.

Usage: python scripts/profile_r09.py [section ...]   (default: all)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from phoenix_spark.session import get_spark
from scripts.metrics_ab import Probe

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def force(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> int:
    sections = set(sys.argv[1:]) or {"shingle", "cosine", "decon"}
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    # spark.ui.enabled is a static conf (get_spark pins it false), so build
    # the session here with the same knobs + the UI for the stages API.
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName("phoenix_r09_profile")
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "4050")
        .config("spark.sql.files.maxPartitionBytes", "128m")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    probe = Probe(spark)

    from phoenix_spark.queries._util import spread, t
    from phoenix_spark.queries.pipeline_dedup import _shingles_col

    docs = lambda: spread(spark, t(spark, SF, "documents"))

    if "shingle" in sections:
        print("== 1. shingle+md5 per-element decomposition (sf0.1) ==")
        toks = F.split(F.trim(F.col("text")), r"\s+")
        variants = {
            # a) tokenize only
            "a_tokenize": lambda: docs().select("doc_id", toks.alias("tk")),
            # b) + 3-gram build (arrays_zip + transform concat_ws)
            "b_shingle_nodistinct": lambda: docs().select(
                "doc_id",
                F.transform(
                    F.arrays_zip(
                        F.slice(toks, F.lit(1), F.greatest(F.size(toks) - 2, F.lit(1))),
                        F.slice(toks, F.lit(2), F.greatest(F.size(toks) - 2, F.lit(1))),
                        F.slice(toks, F.lit(3), F.greatest(F.size(toks) - 2, F.lit(1))),
                    ),
                    lambda s: F.concat_ws(" ", s["0"], s["1"], s["2"]),
                ).alias("sh"),
            ),
            # c) + array_distinct  (the full _shingles_col)
            "c_shingle_distinct": lambda: docs().select(
                "doc_id", _shingles_col().alias("sh")
            ),
            # d) + md5 hex only
            "d_plus_md5": lambda: docs().select(
                "doc_id",
                F.transform(_shingles_col(), F.md5).alias("hs"),
            ),
            # e) + substr/conv/cast (the 60-bit int, decontaminate's hs)
            "e_plus_conv": lambda: docs().select(
                "doc_id",
                F.transform(
                    _shingles_col(),
                    lambda s: F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast(
                        "bigint"
                    ),
                ).alias("hs"),
            ),
            # f) + pmod P (minhash's hs)
            "f_plus_pmod": lambda: docs().select(
                "doc_id",
                F.transform(
                    _shingles_col(),
                    lambda s: F.pmod(
                        F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("bigint"),
                        F.lit(2147483647),
                    ),
                ).alias("hs"),
            ),
        }
        for label, mk in variants.items():
            force(mk())  # warm
        for rep in range(2):
            for label, mk in variants.items():
                probe.run(label, lambda mk=mk: force(mk()), n=1)

    if "cosine" in sections:
        print("== 2. cosine-fold isolation (sf0.1) ==")
        from phoenix_spark.queries.pipeline_similarity import _quantized

        emb = lambda: _quantized(spark, SF)
        # join shape of knn_batch's scored stage, with and without the fold
        def knn_scored(with_dot: bool):
            e = emb()
            queries = e.filter(F.col("vec_id") <= 8).select(
                F.col("vec_id").alias("qid"),
                F.col("q").alias("qq"),
                F.col("qn").alias("qqn"),
            )
            corpus = e.filter(F.col("vec_id") > 8)
            j = corpus.crossJoin(F.broadcast(queries))
            if not with_dot:
                return j.select("qid", "vec_id", F.size("q").alias("d"))
            dot = F.expr(
                "aggregate(zip_with(q, qq, (x, y) -> x * y), cast(0 as bigint),"
                " (acc, v) -> acc + v)"
            )
            return j.select(
                "qid",
                "vec_id",
                (dot / (F.sqrt(F.col("qn")) * F.sqrt(F.col("qqn")))).alias("cos"),
            )

        for label, mk in {
            "knn_join_no_fold": lambda: knn_scored(False),
            "knn_join_with_fold": lambda: knn_scored(True),
            "quantize_only": emb,
        }.items():
            force(mk())
            probe.run(label, lambda mk=mk: force(mk()), n=2)

    if "decon" in sections:
        print("== 3. text_decontaminate stage decomposition (sf0.1) ==")
        from phoenix_spark.queries.pipeline_sampling import _HASH_SH, _BENCH_PRED

        def base():
            return docs().select(
                "doc_id", F.transform(_shingles_col(), _HASH_SH).alias("hs")
            )

        def full(expr_only=False):
            from pyspark import StorageLevel

            b = base().persist(StorageLevel.MEMORY_AND_DISK)
            hashed = b.select("doc_id", F.explode("hs").alias("h"))
            bench = hashed.filter(F.expr(_BENCH_PRED)).select("h").distinct()
            out = (
                hashed.filter(~F.expr(_BENCH_PRED))
                .join(F.broadcast(bench), "h")
                .groupBy("doc_id")
                .agg(F.count(F.lit(1)).cast("long").alias("n_overlap"))
            )
            return out

        variants = {
            "decon_base_map_only": base,
            "decon_explode_only": lambda: base().select(
                "doc_id", F.explode("hs").alias("h")
            ),
            "decon_full": full,
        }
        for label, mk in variants.items():
            spark.catalog.clearCache()
            force(mk())
            probe.run(
                label,
                lambda mk=mk: (spark.catalog.clearCache(), force(mk())),
                n=2,
            )
    return 0


if __name__ == "__main__":
    sys.exit(main())
