"""phoenix_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of Apache Phoenix (reference: apache/phoenix).

Architecture (Spark-first, NOT a port):
  - ``session``   : tuned SparkSession factory (AQE, shuffle sizing, UTC).
  - ``catalog``   : table registry over parquet directories (Phoenix
                    SYSTEM.CATALOG analogue — metadata JSON, PK ordering).
  - ``engine``    : Engine(spark).sql(...) front door; registers tables as
                    temp views and lets Catalyst plan everything.
  - ``queries``   : the operator inventory from SURVEY.md §2 expressed as
                    DataFrame/SQL builders, each paired with a DuckDB oracle.
  - ``functions`` : Phoenix scalar-function surface mapped to JVM-side
                    pyspark.sql.functions (UDFs only where semantics demand).
  - ``operators`` : custom relational operators Spark lacks natively.
  - ``streaming`` : change-log / CDC surface on Structured Streaming.
"""

__version__ = "0.1.0"

from phoenix_spark.engine import Engine  # noqa: F401
