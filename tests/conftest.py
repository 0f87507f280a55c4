from __future__ import annotations

import os

import duckdb
import pytest

SF_TEST_DIR = os.environ.get("PHOENIX_SPARK_TEST_SF", "/root/testdata/sf0.001")

# The FAST test set (run by default — see pytest.ini): full oracle parity
# for every registered query, the 100 TB plan-contract sweep, and the
# Arrow-kernel equivalence pins.  Everything else (the IT-replay suites,
# engine/property/streaming tests) is marked slow and runs via
# `pytest tests/ -m "" -q`.
_FAST_FILES = {
    "test_oracle_parity.py",
    "test_plans.py",
    "test_text_kernel.py",
    "test_shingle_kernel.py",
    "test_cosine_kernel.py",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if os.path.basename(str(item.fspath)) not in _FAST_FILES:
            item.add_marker(pytest.mark.slow)
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="session")
def spark():
    from phoenix_spark.session import get_spark

    s = get_spark(app_name="phoenix_spark_tests", master="local[8]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(autouse=True)
def _clear_sql_cache():
    """r8 ADVICE: query builders persist() intermediates with no unpersist
    path; on the shared session cached entries would otherwise accumulate
    across the whole suite (and cached subtrees would substitute into later
    tests' plans).  Clearing after each test keeps tests independent and
    bounds memory; a no-op when no Spark session is active."""
    yield
    from pyspark.sql import SparkSession

    s = SparkSession.getActiveSession()
    if s is not None:
        try:
            s.catalog.clearCache()
        except Exception:
            pass


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{SF_TEST_DIR}/{name}.parquet'"
        )
    yield con
    con.close()
