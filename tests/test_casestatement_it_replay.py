"""CaseStatementIT replay over the reference's canonical ATABLE fixture.

The 9-row ATABLE (BaseTest.initATableValues, TestUtil ROW1..ROW9) backs a
large family of query ITs; this module recreates it verbatim through
Engine.sql (DDL from BaseTest's ATABLE_NAME entry) and replays
CaseStatementIT's queries (CaseStatementIT.java:70-225).  The fixture date
is pinned to 2024-06-01 and the IT's `new Date(now)` bind to 12:00 the same
day, preserving the IT's date-vs-now ordering (rows at D are in the past,
rows at D+1/D+2 days are in the future)."""

from __future__ import annotations

import pytest

from tests.conftest import SF_TEST_DIR
from tests.atable import ROWS, TENANT


@pytest.fixture()
def atable(spark, tmp_path):
    from phoenix_spark.engine import Engine

    from tests.atable import create_atable

    e = Engine(spark, sf_dir=SF_TEST_DIR, warehouse=str(tmp_path / "wh"))
    create_atable(e)
    return e


def test_simple_case_statement(atable):
    # CaseStatementIT.java:70-89
    rows = atable.sql(
        "SELECT CASE a_integer WHEN 1 THEN 'a' WHEN 2 THEN 'b' WHEN 3 THEN 'c' "
        "ELSE 'd' END AS c, entity_id AS a FROM atable "
        "WHERE organization_id=? AND a_integer < 6 ORDER BY entity_id",
        [TENANT],
    ).collect()
    assert [(r.c, r.a) for r in rows] == [
        ("a", ROWS[0]), ("b", ROWS[1]), ("c", ROWS[2]), ("d", ROWS[3]), ("d", ROWS[4]),
    ]


def test_multi_cond_case_statement(atable):
    # CaseStatementIT.java:92-125 — 1.5,1.5,2,4.5,4.5,4.5,5,5,5
    rows = atable.sql(
        "SELECT CAST(CASE WHEN a_integer <= 2 THEN 1.5 WHEN a_integer = 3 THEN 2 "
        "WHEN a_integer <= 6 THEN 4.5 ELSE 5 END AS DOUBLE) AS a FROM atable "
        "WHERE organization_id=? ORDER BY a_integer",
        [TENANT],
    ).collect()
    assert [r.a for r in rows] == [1.5, 1.5, 2.0, 4.5, 4.5, 4.5, 5.0, 5.0, 5.0]


def test_partial_eval_case_statement(atable):
    # CaseStatementIT.java:128-145
    rows = atable.sql(
        "SELECT entity_id FROM atable WHERE organization_id=? and "
        "CASE WHEN 1234 = a_integer THEN 1 WHEN x_integer = 5 THEN 2 ELSE 3 END = 2",
        [TENANT],
    ).collect()
    assert [r.entity_id for r in rows] == [ROWS[6]]  # ROW7


def test_found_index_on_partial_eval_case_statement(atable):
    # CaseStatementIT.java:147-164
    rows = atable.sql(
        "SELECT entity_id FROM atable WHERE organization_id=? and "
        "CASE WHEN a_integer = 1234 THEN 1 WHEN x_integer = 3 THEN y_integer "
        "ELSE 3 END = 300",
        [TENANT],
    ).collect()
    assert [r.entity_id for r in rows] == [ROWS[8]]  # ROW9


def test_unfound_multi_column_case_statement(atable):
    # CaseStatementIT.java:167-185 — 'now' pinned between D and D+1 day, the
    # same ordering the IT gets from Date(System.currentTimeMillis())
    rows = atable.sql(
        "SELECT entity_id, b_string FROM atable WHERE organization_id=? and "
        "CASE WHEN a_integer = 1234 THEN 1 WHEN a_date < ? THEN y_integer "
        "WHEN x_integer = 4 THEN 4 ELSE 3 END = 4",
        [TENANT, "2024-06-01 12:00:00"],
    ).collect()
    assert [r.entity_id for r in rows] == [ROWS[7]]  # ROW8


def test_null_vs_nonnull_multi_cond_case(atable):
    # CaseStatementIT.java:187-223's nullability metadata, asserted at the
    # value level: a CASE with ELSE never yields NULL; without ELSE the
    # unmatched rows yield NULL
    rows = atable.sql(
        "SELECT CASE WHEN entity_id = '000000000000000' THEN 1 "
        "WHEN entity_id = '000000000000001' THEN 2 ELSE 3 END AS v "
        "FROM atable WHERE organization_id=?",
        [TENANT],
    ).collect()
    assert all(r.v == 3 for r in rows) and len(rows) == 9
    rows = atable.sql(
        "SELECT CASE WHEN entity_id = '000000000000000' THEN 1 "
        "WHEN entity_id = '000000000000001' THEN 2 END AS v "
        "FROM atable WHERE organization_id=?",
        [TENANT],
    ).collect()
    assert all(r.v is None for r in rows) and len(rows) == 9
