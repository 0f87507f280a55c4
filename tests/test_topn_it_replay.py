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


def test_delete_parser_subquery_order_by_limit():
    """DELETE whose WHERE contains a subquery with its own ORDER BY/LIMIT:
    the clause splitter recognizes the delete's ORDER BY/LIMIT only at paren
    depth 0 (DeleteCompiler parses the statement, not a flat regex)."""
    from phoenix_spark.ddl import parse_delete

    d = parse_delete(
        "DELETE FROM t WHERE id IN (SELECT id FROM u ORDER BY x LIMIT 5)"
    )
    assert d.where == "id IN (SELECT id FROM u ORDER BY x LIMIT 5)"
    assert d.order_by is None and d.limit is None

    d = parse_delete(
        "DELETE FROM t WHERE a = 'ORDER BY trap' AND b IN "
        "(SELECT b FROM u WHERE c LIKE '%LIMIT%' ORDER BY q LIMIT 7) "
        "ORDER BY b DESC LIMIT 3"
    )
    assert "ORDER BY q LIMIT 7" in d.where
    assert d.order_by == "b DESC" and d.limit == 3


def test_delete_subquery_topn_end_to_end(engine):
    """End-to-end: DELETE ... WHERE pk IN (subquery with ORDER BY/LIMIT)."""
    before = engine.sql("SELECT count(1) AS c FROM atable").collect()[0].c
    n = engine.sql(
        "DELETE FROM atable WHERE entity_id IN "
        "(SELECT entity_id FROM atable ORDER BY a_integer DESC LIMIT 2)"
    )
    assert n == 2
    after = engine.sql("SELECT count(1) AS c FROM atable").collect()[0].c
    assert after == before - 2
