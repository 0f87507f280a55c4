"""Driver emulation: vanilla SparkSession, entry() smoke + full oracle
compare at sf0.01 (the driver's correctness gate scale).

Pass an sf directory to run the same compare at another scale, e.g.
``python scripts/drive_entry.py /root/testdata/sf0.1`` for the 100x-the-
default-parity-SF sweep."""

import sys

sys.path.insert(0, "/root/repo")

import duckdb
import pandas as pd
from pyspark.sql import SparkSession

from tests.parity import compare

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

spark = SparkSession.builder.master("local[8]").getOrCreate()

import __spark_entry__ as E

# 1. entry smoke: runs, >=0 rows, stable schema across two calls
df1 = E.entry(spark)
s1 = df1.schema
rows = df1.collect()
s2 = E.entry(spark).schema
assert s1 == s2, "entry() schema unstable"
print(f"entry(): {len(rows)} rows, schema stable")

# 2. oracle compare
con = duckdb.connect()
for t in TABLES:
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
    )

qs, osql = E.queries(), E.oracle_sql()
fails, rows_only = [], []
for name in sorted(qs):
    # r8 ADVICE: query builders persist() intermediates with no unpersist
    # path; clear the SQL cache per query so runs stay independent and
    # cached entries don't accumulate across the 193-query sweep.
    spark.catalog.clearCache()
    try:
        sdf = qs[name](spark, SF).toPandas()
    except Exception as ex:
        fails.append((name, f"SPARK ERROR: {str(ex).splitlines()[0][:160]}"))
        continue
    if name not in osql:
        rows_only.append((name, len(sdf)))
        continue
    try:
        ddf = con.execute(osql[name]).df()
    except Exception as ex:
        fails.append((name, f"ORACLE ERROR: {str(ex).splitlines()[0][:160]}"))
        continue
    probs = compare(sdf, ddf)
    if probs:
        fails.append((name, "; ".join(probs)[:240]))
print(f"\n{len(qs)} queries: {len(qs) - len(fails) - len(rows_only)} "
      f"hash-match, {len(rows_only)} rows-only, {len(fails)} FAIL")
for name, n in rows_only:
    print(f"  rows-only {name}: {n} rows")
for name, msg in fails:
    print(f"  FAIL {name}: {msg}")
sys.exit(1 if fails else 0)
