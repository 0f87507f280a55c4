"""TopNIT replay (end2end/TopNIT.java) over the ATABLE fixture — top-N
reads (multi-key ORDER BY LIMIT, expression sort keys incl. || and
arithmetic) and DeleteCompiler's ordered top-N DELETE with its
executeUpdate count."""

from __future__ import annotations

import pytest

from tests.atable import ROWS, TENANT
from tests.conftest import SF_TEST_DIR


@pytest.fixture()
def engine(spark, tmp_path):
    from phoenix_spark.engine import Engine

    from tests.atable import create_atable

    e = Engine(spark, sf_dir=SF_TEST_DIR, warehouse=str(tmp_path / "wh"))
    create_atable(e)
    return e


def ids(engine, sql):
    return [r[0] for r in engine.sql(sql).collect()]


def test_multi_order_by_expr(engine):
    # TopNIT.java:44 — b_string groups a/b/c interleave; entity_id breaks ties
    got = ids(engine, (
        "SELECT entity_id FROM atable ORDER BY b_string, entity_id LIMIT 5"
    ))
    assert got == [ROWS[0], ROWS[3], ROWS[6], ROWS[1], ROWS[4]]


def test_desc_multi_order_by_expr(engine):
    # TopNIT.java:71 — || expression sort key, bare DESC
    got = ids(engine, (
        "SELECT entity_id FROM atable "
        "ORDER BY b_string || entity_id DESC LIMIT 5"
    ))
    assert got == [ROWS[8], ROWS[5], ROWS[2], ROWS[7], ROWS[4]]


def test_topn_delete(engine):
    # TopNIT.java:108 — ordered top-N DELETE; count = rows tombstoned;
    # the survivors then sort by expression keys (8-a_integer) with an
    # explicit NULLS LAST
    n = engine.sql(
        "DELETE FROM atable ORDER BY b_string, entity_id LIMIT 5"
    )
    assert n == 5
    got = ids(engine, (
        "SELECT entity_id FROM atable "
        "ORDER BY b_string, x_decimal NULLS LAST, 8-a_integer LIMIT 5"
    ))
    assert got == [ROWS[7], ROWS[8], ROWS[5], ROWS[2]]
