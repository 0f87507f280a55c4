#!/usr/bin/env python3
"""Per-query breakdown: driver-side build time vs executed (noop) time.

Usage: python scripts/profile_queries.py [names...]
Runs each query (default: bench HEADLINE) at $SPARK_GRAFT_SF_DIR three
ways after warm-up: build-only (py4j plan construction), first noop run,
then median of 3 further noop runs.  Prints a table.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE
from phoenix_spark.queries import all_queries
from phoenix_spark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WARM = "/root/testdata/sf0.001"


def force(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> int:
    names = sys.argv[1:] or HEADLINE
    spark = get_spark(app_name="phoenix_spark_profile")
    qs = all_queries()
    names = [n for n in names if n in qs]
    for n in names:  # warm-up: codegen/JIT outside the timed region
        force(qs[n](spark, WARM if os.path.isdir(WARM) else SF))
    print(f"{'query':32s} {'build':>7s} {'run1':>7s} {'med3':>7s}")
    rows = []
    for n in names:
        t0 = time.perf_counter()
        df = qs[n](spark, SF)
        build = time.perf_counter() - t0
        t0 = time.perf_counter()
        force(df)
        run1 = time.perf_counter() - t0
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            force(qs[n](spark, SF))
            runs.append(time.perf_counter() - t0)
        med = sorted(runs)[1]
        rows.append((n, build, run1, med))
        print(f"{n:32s} {build:7.3f} {run1:7.3f} {med:7.3f}")
    tot = sum(r[3] for r in rows)
    print(f"{'TOTAL (med3)':32s} {'':7s} {'':7s} {tot:7.3f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
