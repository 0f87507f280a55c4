"""Engine: the JDBC-driver analogue (reference: phoenix-core-client/.../jdbc/
PhoenixStatement.java — parse → compile → optimize → execute).

In the Spark-first design the whole compile/optimize/execute back half is
Catalyst: ``Engine.sql`` registers catalog tables as views, optionally
rewrites Phoenix-dialect constructs to Spark SQL (see sqlfront), and returns
a lazily-planned DataFrame.  No custom planner — predicate pushdown, column
pruning, join selection, subquery decorrelation etc. are Catalyst built-ins
(SURVEY.md §4.1 maps each Phoenix optimization to its Catalyst equivalent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from phoenix_spark.catalog import Catalog
from phoenix_spark.sqlfront import translate_phoenix_sql


class Engine:
    def __init__(self, spark: SparkSession, sf_dir: str | None = None):
        self.spark = spark
        self.catalog: Catalog | None = None
        if sf_dir is not None:
            self.attach(sf_dir)

    def attach(self, sf_dir: str) -> "Engine":
        """Point the engine at a data directory and register its tables."""
        self.catalog = Catalog(self.spark, sf_dir)
        self.catalog.register_all()
        return self

    def table(self, name: str) -> DataFrame:
        assert self.catalog is not None, "attach(sf_dir) first"
        return self.catalog.df(name)

    def sql(self, text: str) -> DataFrame:
        """Run SQL. Accepts Spark SQL plus the Phoenix-dialect constructs
        handled by sqlfront (function-name mapping, UPSERT, etc.)."""
        return self.spark.sql(translate_phoenix_sql(text))

    def explain(self, text: str) -> str:
        return self.sql(text)._jdf.queryExecution().explainString(  # noqa: SLF001
            self.spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(  # noqa: SLF001
                "formatted"
            )
        )
