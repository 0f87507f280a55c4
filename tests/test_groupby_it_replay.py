"""GroupByIT replay (phoenix-core/src/it/.../GroupByIT.java) over the shared
ATABLE fixture plus the IT's own tables.

Pins: select-alias shadowing the column name in GROUP BY, constant columns
through grouped/distinct aggregation, DISTINCT over grouped aggregates with
ORDER BY count(1) and LIMIT, integer division as a GROUP BY key referenced
by its output ALIAS (with a double-quoted reserved-word column), grouping
by a BOOLEAN expression incl. its NULL group, and HAVING over a select
alias."""

from __future__ import annotations

import pytest

from tests.atable import ROWS, TENANT, create_atable
from tests.conftest import SF_TEST_DIR


@pytest.fixture()
def engine(spark, tmp_path):
    from phoenix_spark.engine import Engine

    return Engine(spark, sf_dir=SF_TEST_DIR, warehouse=str(tmp_path / "wh"))


@pytest.fixture()
def atable(engine):
    create_atable(engine)
    return engine


def test_grouped_aggregation_alias_and_constant(atable):
    # GroupByIT.java:65-92 — alias same as column name + constant column
    rows = atable.sql(
        "SELECT a_string as a_string, count(1) AS c, 'foo' AS f FROM atable "
        "WHERE organization_id=? GROUP BY a_string ORDER BY a_string",
        [TENANT],
    ).collect()
    assert [(r.a_string, r.c, r.f) for r in rows] == [
        ("a", 4, "foo"), ("b", 4, "foo"), ("c", 1, "foo"),
    ]


def test_distinct_grouped_aggregation(atable):
    # GroupByIT.java:95-134
    rows = atable.sql(
        "SELECT DISTINCT a_string, count(1) AS c, 'foo' AS f FROM atable "
        "WHERE organization_id=? GROUP BY a_string, b_string "
        "ORDER BY a_string, count(1)",
        [TENANT],
    ).collect()
    assert [(r.a_string, r.c) for r in rows] == [
        ("a", 1), ("a", 2), ("b", 1), ("b", 2), ("c", 1),
    ]


def test_distinct_limited_grouped_aggregation(atable):
    # GroupByIT.java:137-169
    rows = atable.sql(
        "SELECT DISTINCT a_string, count(1) AS c, 'foo' AS f FROM atable "
        "WHERE organization_id=? GROUP BY a_string, b_string "
        "ORDER BY count(1) desc, a_string LIMIT 2",
        [TENANT],
    ).collect()
    assert [(r.a_string, r.c) for r in rows] == [("a", 2), ("b", 2)]


def test_distinct_ungrouped_and_grouped_limited(atable):
    # GroupByIT.java:172-221
    rows = atable.sql(
        "SELECT DISTINCT count(1) AS c, 'foo' AS f FROM atable WHERE organization_id=?",
        [TENANT],
    ).collect()
    assert len(rows) == 1 and rows[0].c == 9
    rows = atable.sql(
        "SELECT a_string, count(1) AS c FROM atable WHERE organization_id=? "
        "GROUP BY a_string ORDER BY a_string LIMIT 2",
        [TENANT],
    ).collect()
    assert [(r.a_string, r.c) for r in rows] == [("a", 4), ("b", 4)]


def test_group_by_integer_division_alias(engine):
    # GroupByIT.java zTestGroupByWithIntegerDivision1/2 — "time" is a
    # double-quoted reserved word, the division must truncate, and the
    # GROUP BY references the OUTPUT alias
    engine.sql(
        'create table gdiv ("time" integer not null, hostname varchar not null, '
        'usage float, period integer constraint pk PRIMARY KEY("time", hostname))'
    )
    for t, h, u, p in (
        (1439853462, "qa9", 8.27, 1439853462),
        (1439853461, "qa9", 8.27, 1439853362),
        (1439853461, "qa9", 5.27, 1439853461),
        (1439853451, "qa9", 4.27, 1439853451),
    ):
        engine.sql(f"upsert into gdiv values({t},'{h}',CAST({u} AS FLOAT),{p})")
    for col in ('"time"', "period"):
        rows = engine.sql(
            f"select {col}/10 as tm, hostname, avg(usage) AS a FROM gdiv "
            "group by hostname, tm ORDER BY tm"
        ).collect()
        assert [r.tm for r in rows] == [143985345, 143985346], col
        assert abs(rows[0].a - 4.27) < 0.1 and abs(rows[1].a - 6.77) < 0.1


def test_group_by_boolean_condition_with_null_group(atable):
    # GroupByIT.java:291-346 — GROUP BY a_integer=6, then a NULL group after
    # nulling a_integer for ROW3
    rows = atable.sql(
        "SELECT count(*) AS c FROM atable WHERE organization_id=? GROUP BY a_integer=6",
        [TENANT],
    ).collect()
    assert sorted(r.c for r in rows) == [1, 8]
    atable.sql(
        "UPSERT into atable (organization_id,entity_id,a_integer) "
        f"values('{TENANT}','{ROWS[2]}',null)"
    )
    rows = atable.sql(
        "SELECT count(*) AS c FROM atable WHERE organization_id=? GROUP BY a_integer=6",
        [TENANT],
    ).collect()
    assert sorted(r.c for r in rows) == [1, 1, 7]
    rows = atable.sql(
        "SELECT count(*) AS c, a_integer=6 AS p FROM atable WHERE organization_id=? "
        "and (a_integer IN (5,6) or a_integer is null) GROUP BY a_integer=6",
        [TENANT],
    ).collect()
    assert sorted(((r.c, r.p) for r in rows), key=str) == sorted(
        [(1, None), (1, False), (1, True)], key=str
    )


def test_group_by_having_with_alias(engine):
    # GroupByIT.java:349-446 — HAVING references the select alias
    engine.sql(
        "CREATE TABLE gh1 (a_string varchar not null, col1 integer "
        "CONSTRAINT pk PRIMARY KEY (a_string))"
    )
    for v, n in (("a", 40), ("b", 20), ("c", 30)):
        engine.sql(f"UPSERT INTO gh1 VALUES('{v}', {n})")
    rows = engine.sql(
        "SELECT a_string, sum(col1) as sumCol1 FROM gh1 "
        "GROUP BY a_string HAVING sumCol1>20 ORDER BY sumCol1"
    ).collect()
    assert [(r.a_string, int(r.sumCol1)) for r in rows] == [("c", 30), ("a", 40)]
    engine.sql(
        "CREATE TABLE gh2 (a_string varchar not null, col1 integer not null, "
        "col2 varchar, col3 integer CONSTRAINT pk PRIMARY KEY (a_string, col1))"
    )
    for a, c1, c2, c3 in (
        ("a1xyz", 40, "col2xyz1", 50),
        ("b1xyz", 20, "col2xyz2", 60),
        ("c1xyz", 30, "col2xyz3", 70),
    ):
        engine.sql(f"UPSERT INTO gh2 VALUES('{a}', {c1}, '{c2}', {c3})")
    rows = engine.sql(
        "SELECT a_string, col1, sum(col1) as sumCol1 FROM gh2 "
        "GROUP BY a_string, col1 HAVING sumCol1 > 20 ORDER BY sumCol1"
    ).collect()
    assert [(r.a_string, int(r.col1), int(r.sumCol1)) for r in rows] == [
        ("c1xyz", 30, 30), ("a1xyz", 40, 40),
    ]
