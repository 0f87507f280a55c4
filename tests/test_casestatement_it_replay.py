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

TENANT = "00D300000000XHP"
ROWS = [f"00A{i}23122312312" for i in (1, 2, 3, 4)] + [
    f"00B{i}23122312312" for i in (5, 6, 7, 8)
] + ["00C923122312312"]
D = "2024-06-01 00:00:00"


@pytest.fixture()
def atable(spark, tmp_path):
    from phoenix_spark.engine import Engine

    e = Engine(spark, sf_dir=SF_TEST_DIR, warehouse=str(tmp_path / "wh"))
    # BaseTest.java ATABLE_NAME DDL, verbatim (a_time/a_timestamp omitted —
    # initATableValues never populates them)
    e.sql(
        "create table atable (organization_id char(15) not null, "
        "entity_id char(15) not null, a_string varchar(100), "
        "b_string varchar(100), a_integer integer, a_date date, "
        "x_decimal decimal(31,10), x_long bigint, x_integer integer, "
        "y_integer integer, a_byte tinyint, a_short smallint, "
        "a_float float, a_double double, "
        "constraint pk primary key (organization_id, entity_id))"
    )
    # initATableValues rows: (entity, a_string, b_string, a_integer,
    # date_offset_days|None, x_decimal, x_long, x_integer, y_integer,
    # a_byte, a_short, a_float, a_double)
    data = [
        (ROWS[0], "a", "b", 1, 0, None, None, None, None, 1, 128, 0.01, 0.0001),
        (ROWS[1], "a", "c", 2, 1, None, None, None, None, 2, 129, 0.02, 0.0002),
        (ROWS[2], "a", "e", 3, 2, None, None, None, None, 3, 130, 0.03, 0.0003),
        (ROWS[3], "a", "b", 4, 0, None, None, None, None, 4, 131, 0.04, 0.0004),
        (ROWS[4], "b", "c", 5, 1, None, None, None, None, 5, 132, 0.05, 0.0005),
        (ROWS[5], "b", "e", 6, 2, None, None, None, None, 6, 133, 0.06, 0.0006),
        (ROWS[6], "b", "b", 7, 0, 0.1, 5, 5, None, 7, 134, 0.07, 0.0007),
        (ROWS[7], "b", "c", 8, 1, 3.9, -2147483649, 4, None, 8, 135, 0.08, 0.0008),
        (ROWS[8], "c", "e", 9, 2, 3.3, 2147483648, 3, 300, 9, 0, 0.09, 0.0009),
    ]
    for (ent, a_s, b_s, a_i, doff, x_d, x_l, x_i, y_i, a_b, a_sh, a_f, a_d) in data:
        date = f"TIMESTAMP '{D}' + {doff}" if doff else f"TIMESTAMP '{D}'"
        e.sql(
            "upsert into atable (organization_id, entity_id, a_string, "
            "b_string, a_integer, a_date, x_decimal, x_long, x_integer, "
            "y_integer, a_byte, a_short, a_float, a_double) values "
            f"('{TENANT}', '{ent}', '{a_s}', '{b_s}', {a_i}, {date}, "
            f"{'null' if x_d is None else x_d}, "
            f"{'null' if x_l is None else x_l}, "
            f"{'null' if x_i is None else x_i}, "
            f"{'null' if y_i is None else y_i}, "
            f"{a_b}, {a_sh}, CAST({a_f} AS FLOAT), {a_d})"
        )
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
