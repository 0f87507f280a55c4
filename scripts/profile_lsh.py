#!/usr/bin/env python3
"""Ad-hoc stage profiler for the LSH-family queries (round-3 tuning aid)."""
import sys, time

sys.path.insert(0, ".")
from phoenix_spark.session import get_spark
from phoenix_spark.queries import pipeline_dedup as PD
from phoenix_spark.queries import pipeline_similarity as PS

SF = "/root/testdata/sf0.1"


def force(df):
    df.write.format("noop").mode("overwrite").save()


def bench(name, fn, n=1):
    t0 = time.perf_counter()
    for _ in range(n):
        force(fn())
    dt = (time.perf_counter() - t0) / n
    print(f"{name:45s} {dt:7.3f}s")
    return dt


spark = get_spark(app_name="profile_lsh")

# warm up
force(PD._docs_wide(spark, SF).limit(1))

# --- minhash stages ---
bench("minhash: shingled", lambda: PD._shingled(spark, SF))
bench("minhash: full", lambda: PD._minhash_lsh(spark, SF))
bench("minhash: candidates_only", lambda: PD._minhash_lsh(spark, SF, candidates_only=True))

# --- simhash stages ---
bench("simhash: fp only", lambda: PD._simhash_fp(spark, SF))
bench("simhash: candidates_only", lambda: PD._simhash(spark, SF, candidates_only=True))
bench("simhash: full", lambda: PD._simhash(spark, SF))

# --- sign-LSH stages ---
bench("signlsh: quantized", lambda: PS._quantized(spark, SF))
bench("signlsh: bands", lambda: PS._sim_bands(spark, SF))
bench("signlsh: candidates_only", lambda: PS._lsh_pairs(spark, SF, candidates_only=True))
bench("signlsh: full", lambda: PS._lsh_pairs(spark, SF))
