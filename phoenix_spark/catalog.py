"""Table catalog: the Phoenix SYSTEM.CATALOG analogue.

Phoenix stores table metadata (schema, composite PK with per-column sort
order, salt buckets, multi-tenancy) in a catalog table maintained by a
coprocessor endpoint (reference: phoenix-core-server/.../coprocessor/
MetaDataEndpointImpl.java; PTable at phoenix-core-client/.../schema/
PTable.java:57).  Here the catalog is a dict of TableMeta over parquet
directories; the physical concerns Phoenix encodes in the row key (salting,
sort order) map to Spark partitioning and are recorded as metadata only.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

# The driver fixture tables (TESTDATA.md / FIXTURES.md §A) with their declared
# primary keys — PK = Phoenix composite row key; used for deterministic
# ordering, RVC pagination and change-log compaction identity.
FIXTURE_PKS: dict[str, tuple[str, ...]] = {
    "region": ("r_regionkey",),
    "nation": ("n_nationkey",),
    "customer": ("c_custkey",),
    "supplier": ("s_suppkey",),
    "part": ("p_partkey",),
    "orders": ("o_orderkey",),
    "lineitem": ("l_orderkey", "l_linenumber"),
    "events": ("event_id",),
    "documents": ("doc_id",),
    "embeddings": ("vec_id",),
}

TABLE_NAMES = tuple(FIXTURE_PKS)


@dataclass
class TableMeta:
    name: str
    path: str
    pk: tuple[str, ...] = ()
    salt_buckets: int = 0  # parsed-and-ignored: hash partitioning is native
    props: dict = field(default_factory=dict)


class Catalog:
    """Registry of tables for one data directory (one 'schema')."""

    def __init__(self, spark: SparkSession, sf_dir: str):
        self.spark = spark
        self.sf_dir = sf_dir.rstrip("/")
        self.tables: dict[str, TableMeta] = {}
        for name, pk in FIXTURE_PKS.items():
            self.tables[name] = TableMeta(
                name=name, path=f"{self.sf_dir}/{name}.parquet", pk=pk
            )

    def df(self, name: str) -> DataFrame:
        meta = self.tables[name]
        return read_table(self.spark, meta.path)

    def register_all(self) -> None:
        """Expose every table as a temp view so spark.sql() sees the schema."""
        for name in self.tables:
            self.df(name).createOrReplaceTempView(name)


def read_table(spark: SparkSession, path: str) -> DataFrame:
    """Read a parquet table, tolerating TIMESTAMP(NANOS) columns.

    Spark has no nanosecond timestamp type; parquet TIMESTAMP(NANOS) columns
    (the events.ts ROW_TIMESTAMP analogue) raise PARQUET_TYPE_ILLEGAL.  With
    ``spark.sql.legacy.parquet.nanosAsLong`` they read as raw nano counts,
    which we convert to TimestampType (µs, truncating) — matching Phoenix's
    own behavior of truncating TIMESTAMP nanos beyond its ms+nanos model
    (reference: phoenix-core-client/.../schema/types/PTimestamp.java).
    """
    import pyspark.sql.functions as F

    nanos_cols = _nanos_columns(path)
    if not nanos_cols:
        return spark.read.parquet(path)
    # Leave the conf on: it only affects TIMESTAMP(NANOS) columns, and the
    # scan itself (action time) still needs it.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    for name in nanos_cols:
        # Exact ns→µs truncation in integer arithmetic: epoch nanos (~1.8e18)
        # exceed double's 2^53 exact range, so `col / 1000` (double division)
        # could land a microsecond off; `div` stays in long arithmetic.
        df = df.withColumn(name, F.timestamp_micros(F.expr(f"`{name}` div 1000")))
    return df


def _nanos_columns(path: str) -> list[str]:
    """Names of TIMESTAMP(NANOS) columns, probed from one parquet footer.

    Handles both a single .parquet file and a directory of part files (the
    100 TB table shape) — all fragments of one table share a schema.
    """
    import glob
    import os

    import pyarrow.parquet as pq

    probe = path
    if os.path.isdir(path):
        parts = sorted(glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True))
        if not parts:
            return []
        probe = parts[0]
    arrow_schema = pq.read_schema(probe)
    return [f.name for f in arrow_schema if str(f.type).startswith("timestamp[ns")]


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    cat = Catalog(spark, sf_dir)
    return {name: cat.df(name) for name in cat.tables}
