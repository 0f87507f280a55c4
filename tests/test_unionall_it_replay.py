"""UnionAllIT replay (phoenix-core/src/it/.../UnionAllIT.java):
type-unified UNION ALL across differently-typed tables (varchar/char,
int/bigint/tinyint), aggregates per arm, trailing ORDER BY/LIMIT binding to
the WHOLE union (with an output alias), and bind parameters inside arms."""

from __future__ import annotations

import pytest

from tests.conftest import SF_TEST_DIR


@pytest.fixture()
def engine(spark, tmp_path):
    from phoenix_spark.engine import Engine

    return Engine(spark, sf_dir=SF_TEST_DIR, warehouse=str(tmp_path / "wh"))


def test_union_all_selects_type_unified(engine):
    # UnionAllIT.java:50-103 — varchar(10)/integer vs char(20)/bigint
    engine.sql(
        "CREATE TABLE u1 (a_string varchar(10) not null, col1 integer "
        "CONSTRAINT pk PRIMARY KEY (a_string))"
    )
    engine.sql("UPSERT INTO u1 VALUES('a', 10)")
    engine.sql(
        "CREATE TABLE u2 (a_string char(20) not null, col1 bigint "
        "CONSTRAINT pk PRIMARY KEY (a_string))"
    )
    engine.sql("UPSERT INTO u2 VALUES('b', 20)")
    engine.sql("UPSERT INTO u2 VALUES('c', 20)")
    rows = engine.sql(
        "select * from u1 union all select * from u2 union all select * from u1"
    ).collect()
    assert [(r[0].strip(), int(r[1])) for r in rows] == [
        ("a", 10), ("b", 20), ("c", 20), ("a", 10),
    ]


def test_union_all_aggregate_per_arm(engine):
    # UnionAllIT.java:105-157 — each arm aggregates independently
    engine.sql(
        "CREATE TABLE ua1 (a_string char(5) not null, col1 tinyint "
        "CONSTRAINT pk PRIMARY KEY (a_string))"
    )
    for v, n in (("a", 10), ("d", 40), ("e", 50)):
        engine.sql(f"UPSERT INTO ua1 VALUES('{v}', {n})")
    engine.sql(
        "CREATE TABLE ua2 (a_string varchar not null, col1 integer "
        "CONSTRAINT pk PRIMARY KEY (a_string))"
    )
    for v, n in (("b", 20), ("c", 30)):
        engine.sql(f"UPSERT INTO ua2 VALUES('{v}', {n})")
    rows = engine.sql(
        "select count(*) from ua1 union all select count(*) from ua2 "
        "union all select count(*) from ua1"
    ).collect()
    assert [int(r[0]) for r in rows] == [3, 2, 3]


def test_union_all_order_by_limit(engine):
    # UnionAllIT.java:207-283 — ORDER BY / LIMIT bind to the WHOLE union
    engine.sql(
        "CREATE TABLE ub1 (a_string varchar not null, col1 integer "
        "CONSTRAINT pk PRIMARY KEY (a_string))"
    )
    for v, n in (("a", 10), ("f", 10)):
        engine.sql(f"UPSERT INTO ub1 VALUES('{v}', {n})")
    engine.sql(
        "CREATE TABLE ub2 (a_string varchar not null, col1 integer "
        "CONSTRAINT pk PRIMARY KEY (a_string))"
    )
    for v, n in (("b", 20), ("c", 30), ("d", 30), ("e", 30)):
        engine.sql(f"UPSERT INTO ub2 VALUES('{v}', {n})")
    rows = engine.sql(
        "select count(*) AS c, col1 from ub2 group by col1 union all "
        "select count(*) AS c, col1 from ub1 group by col1 order by col1"
    ).collect()
    assert [int(r.c) for r in rows] == [2, 1, 3]
    rows = engine.sql(
        "select count(*) AS c, col1 x from ub1 group by col1 union all "
        "select count(*) AS c, col1 x from ub2 group by col1 order by x limit 2"
    ).collect()
    assert [int(r.c) for r in rows] == [2, 1]
    rows = engine.sql(
        "select * from ub1 union all select * from ub2 limit 2"
    ).collect()
    assert [(r[0], int(r[1])) for r in rows] == [("a", 10), ("f", 10)]


def test_union_all_with_bind_param(engine):
    # UnionAllIT.java:562-607 — one bind per arm, in arm order
    engine.sql(
        "CREATE TABLE uc1 (a_string varchar not null, col1 integer "
        "CONSTRAINT pk PRIMARY KEY (a_string))"
    )
    engine.sql("UPSERT INTO uc1 VALUES('a', 10)")
    engine.sql(
        "CREATE TABLE uc2 (a_string varchar not null, col1 integer "
        "CONSTRAINT pk PRIMARY KEY (a_string))"
    )
    engine.sql("UPSERT INTO uc2 VALUES('b', 20)")
    rows = engine.sql(
        "select a_string, col1 from uc2 where col1=? union all "
        "select a_string, col1 from uc1 where col1=?",
        [20, 10],
    ).collect()
    assert [(r.a_string, int(r.col1)) for r in rows] == [("b", 20), ("a", 10)]
