"""Per-query parity vs DuckDB — local mirror of the driver's t2 gate.

Runs every registry query at sf0.001 (fast) and compares against its oracle.
Queries without an oracle get a rows>=0 smoke check only.
"""

from __future__ import annotations

import pytest

from phoenix_spark.queries import all_oracles, all_queries
from tests.conftest import SF_TEST_DIR
from tests.parity import compare

QUERIES = all_queries()
ORACLES = all_oracles()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_parity(name, spark, duck):
    sdf = QUERIES[name](spark, SF_TEST_DIR).toPandas()
    if name not in ORACLES:
        assert sdf is not None  # rows-only smoke
        return
    ddf = duck.execute(ORACLES[name]).fetchdf()
    problems = compare(sdf, ddf)
    assert not problems, f"{name}: " + " | ".join(problems)
