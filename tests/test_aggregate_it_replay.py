"""AggregateIT replay (end2end/AggregateIT.java) — the portable scenarios:
GROUP BY alias/qualified-name resolution (testGroupByWithAliasWithSame
ColumnName's VALID statements; the reference's AmbiguousColumnException
contract is Phoenix-resolver-specific — Spark resolves base columns first,
a documented superset), PHOENIX-3453's DISTINCT over a LIMITed subquery on
DESC row keys, and nested grouped aggregation at BIGINT extremes."""

from __future__ import annotations

import pytest

from tests.conftest import SF_TEST_DIR


@pytest.fixture()
def engine(spark, tmp_path):
    from phoenix_spark.engine import Engine

    return Engine(spark, sf_dir=SF_TEST_DIR, warehouse=str(tmp_path / "wh"))


def rows(engine, sql):
    return [tuple(r) for r in engine.sql(sql).collect()]


def test_group_by_with_alias_same_column_name(engine):
    # AggregateIT.java:45 — the statements Phoenix accepts must run
    engine.sql("create table agt1 (pk integer primary key, col integer)")
    engine.sql("create table agt3 (notPk integer primary key, col integer)")
    engine.sql("UPSERT INTO agt1 VALUES (1,2)")
    engine.sql("UPSERT INTO agt3 VALUES (1,2)")
    assert rows(engine, "select agt1.pk as pk from agt1 group by pk") == [(1,)]
    assert rows(engine, "select agt1.pk as pk from agt1 group by agt1.pk") == [(1,)]
    assert rows(engine, "select t.pk as pk from agt1 as t group by t.pk") == [(1,)]
    assert rows(engine, "select agt1.col as pk from agt1") == [(2,)]
    assert rows(engine, (
        "select agt1.pk as pk from agt1 join agt3 on (agt1.pk = agt3.notPk) "
        "group by pk"
    )) == [(1,)]


def test_group_by_coerce_expression_bug3453(engine):
    # AggregateIT.java:90 — DISTINCT over a LIMITed subquery with DESC keys
    engine.sql(
        "CREATE TABLE ag3453 (ENTITY_ID INTEGER NOT NULL, "
        "CONTAINER_ID INTEGER NOT NULL, SCORE INTEGER NOT NULL, "
        "CONSTRAINT TEST_PK PRIMARY KEY (ENTITY_ID DESC, CONTAINER_ID DESC, "
        "SCORE DESC))"
    )
    engine.sql("UPSERT INTO ag3453 VALUES (1,1,1)")
    got = rows(engine, (
        "select DISTINCT entity_id, score from "
        "(select entity_id, score from ag3453 limit 1)"
    ))
    assert got == [(1, 1)]
    engine.sql("UPSERT INTO ag3453 VALUES (2,2,2)")
    engine.sql("UPSERT INTO ag3453 VALUES (3,3,3)")
    got = rows(engine, (
        "select DISTINCT entity_id, score from "
        "(select entity_id, score from ag3453 limit 3) order by entity_id"
    ))
    assert got == [(1, 1), (2, 2), (3, 3)]
    got = rows(engine, (
        "select DISTINCT entity_id, score from "
        "(select entity_id, score from ag3453 limit 3) order by entity_id desc"
    ))
    assert got == [(3, 3), (2, 2), (1, 1)]
    # CHAR variant (AggregateIT.java:122)
    engine.sql(
        "CREATE TABLE ag3453c (ENTITY_ID CHAR(15) NOT NULL, "
        "CONTAINER_ID INTEGER NOT NULL, SCORE INTEGER NOT NULL, "
        "CONSTRAINT TEST_PK PRIMARY KEY (ENTITY_ID DESC, CONTAINER_ID DESC, "
        "SCORE DESC))"
    )
    for i in (1, 2, 3):
        engine.sql(f"UPSERT INTO ag3453c VALUES ('entity{i}',{i},{i})")
    got = rows(engine, (
        "select DISTINCT entity_id, score from "
        "(select entity_id, score from ag3453c limit 3) order by entity_id"
    ))
    assert [(v[0].rstrip(), v[1]) for v in got] == [
        ("entity1", 1), ("entity2", 2), ("entity3", 3),
    ]


def test_nested_grouped_aggregation_with_bigint(engine):
    # AggregateIT.java:151 — BIGINT extremes through nested GROUP BYs
    engine.sql(
        "CREATE TABLE agbig (a BIGINT NOT NULL, c BIGINT NOT NULL "
        "CONSTRAINT PK PRIMARY KEY (a, c))"
    )
    engine.sql(
        "UPSERT INTO agbig (a,c) VALUES(4444444444444444444, "
        "5555555555555555555)"
    )
    got = rows(engine, (
        "SELECT a FROM (SELECT a, c FROM agbig GROUP BY a, c) GROUP BY a, c"
    ))
    assert got == [(4444444444444444444,)]
