#!/usr/bin/env python3
"""Capture .explain("formatted") for the headline bench queries.

Usage: python scripts/capture_plans.py <outdir> [suffix] [names...]
Writes <outdir>/<query>_<suffix>.txt for each headline query (default
suffix "before"; default names = the bench HEADLINE list).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE
from phoenix_spark.queries import all_queries
from phoenix_spark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    outdir = sys.argv[1] if len(sys.argv) > 1 else "plans/r08"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    names = sys.argv[3:] or HEADLINE
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark(app_name="phoenix_spark_plans")
    qs = all_queries()
    missing = [n for n in names if n not in qs]
    if missing:
        # a typo'd name must not masquerade as a successful capture
        print(f"ERROR: not in registry: {', '.join(missing)}", file=sys.stderr)
        return 1
    for name in names:
        df = qs[name](spark, SF)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange refs)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
