"""OrderByIT replay (end2end/OrderByIT.java:40-180) — ordered subqueries
under LIMIT re-ordered by the outer query, GROUP BY subqueries sorted by
aggregate expressions, SUBSTR(x, 0, n) behaving 1-based, duplicate-PK
overwrites before re-query; the full query list runs over every
(pk DESC?, salted?) storage variant — storage order must never leak into
results."""

from __future__ import annotations

import pytest

from tests.conftest import SF_TEST_DIR

ROWS1 = [
    ("a11", "a12", "a13", "a14", "a15", "a16"),
    ("a21", "a22", "a23", "a24", "a25", "a26"),
    ("a31", "a32", "a33", "a34", "a35", "a36"),
    ("b11", "b12", "b13", "b14", "b15", "b16"),
    ("b21", "b22", "b23", "b24", "b25", "b26"),
    ("b31", "b32", "b33", "b34", "b35", "b36"),
]

ROWS2 = [
    ("b31", "a12", "a13", "a14", "a15", "a16"),
    ("b31", "a22", "a23", "a24", "a25", "a26"),
    ("b31", "a32", "a33", "a34", "a35", "a36"),
    ("b31", "b12", "b13", "b14", "b15", "b16"),
    ("b31", "b22", "b23", "b24", "b25", "b26"),
]


@pytest.fixture(scope="module", params=["asc_split", "desc_salted"])
def engine(request, tmp_path_factory):
    from phoenix_spark.engine import Engine
    from phoenix_spark.session import get_spark

    spark = get_spark(
        app_name="phoenix_spark_tests", master="local[8]", shuffle_partitions=8
    )
    e = Engine(
        spark, sf_dir=SF_TEST_DIR,
        warehouse=str(tmp_path_factory.mktemp(f"ob2_{request.param}")),
    )
    desc = " desc" if request.param == "desc_salted" else ""
    salt = " SALT_BUCKETS=4" if request.param == "desc_salted" else ""
    e.sql(
        "create table ob2 (pk1 char(20) not null, pk2 char(20) not null, "
        "pk3 char(20) not null, v1 varchar, v2 varchar, v3 varchar, "
        f"CONSTRAINT TEST_PK PRIMARY KEY (pk1{desc}, pk2{desc}, pk3{desc}))"
        + salt
    )
    for r in ROWS1:
        e.sql("UPSERT INTO ob2 VALUES (" + ", ".join(f"'{v}'" for v in r) + ")")
    return e


def col0(engine, sql):
    return [r[0].rstrip() if isinstance(r[0], str) else r[0]
            for r in engine.sql(sql).collect()]


def test_ordered_subquery_reordered(engine):
    # OrderByIT.java:66-88
    got = col0(engine, (
        "select pk3,v1,v2 from (select v1,v2,pk3 from ob2 t "
        "where pk1 > 'a10' order by t.v2,t.v1 limit 10) a order by v2"
    ))
    assert got == ["a13", "a23", "a33", "b13", "b23", "b33"]
    got = col0(engine, (
        "select pk3,v1,v2 from (select v1,v2,pk3 from ob2 t "
        "where pk1 > 'a10' order by t.v2 desc,t.v1 desc limit 10) a "
        "order by v2 desc"
    ))
    assert got == ["b33", "b23", "b13", "a33", "a23", "a13"]
    got = col0(engine, (
        "select pk3,v1,v2 from (select v1,v2,pk3 from ob2 t "
        "where pk1 > 'a10' order by t.v2 desc,t.v1 desc, t.v3 asc limit 10) a "
        "order by v2 desc"
    ))
    assert got == ["b33", "b23", "b13", "a33", "a23", "a13"]


def test_grouped_subquery_with_aggregate_sort_keys(engine):
    # OrderByIT.java:90-126 — SUBSTR(x, 0, 3) is 1-based despite the 0
    got = col0(engine, (
        "select v2,cnt from (select count(pk3) cnt,v1,v2 from ob2 t "
        "where pk1 > 'a10' group by t.v1, t.v2, t.v3 limit 10) a order by v1"
    ))
    assert got == ["a15", "a25", "a35", "b15", "b25", "b35"]
    for tail in (
        "order by count(pk3) desc,t.v2 desc,t.v3 desc limit 10",
        "order by count(pk3) desc,t.v2 desc,t.v3 asc limit 10",
        "order by t.v2 desc, count(pk3) desc, t.v3 desc limit 10",
    ):
        got = col0(engine, (
            "select sub, pk2Cnt from (select substr(v2,0,3) sub, "
            "cast (count(pk3) as bigint) cnt, count(pk2) pk2Cnt from ob2 t "
            f"where pk1 > 'a10' group by t.v1 ,t.v2, t.v3 {tail}) a "
            "order by cnt desc ,sub desc"
        ))
        assert got == ["b35", "b25", "b15", "a35", "a25", "a15"], tail


def test_pk_projection_after_value_sort(engine):
    # OrderByIT.java:128-138
    got = col0(engine, (
        "select v1, pk3, v2 from (select v1,v2,pk3 from ob2 t "
        "where pk1 > 'a10' order by t.v2,t.v1, t.v3 limit 10) a order by v1"
    ))
    assert got == ["a14", "a24", "a34", "b14", "b24", "b34"]
    got = col0(engine, (
        "select pk3,pk1,pk2 from (select pk1,pk2,pk3 from ob2 t "
        "where pk1 > 'a10' order by t.v2, t.v1, t.v3 limit 10) a order by pk3"
    ))
    assert got == ["a13", "a23", "a33", "b13", "b23", "b33"]


def test_duplicate_pk1_rows_after_upsert(engine):
    # OrderByIT.java:140-174 — five more rows under one pk1, then
    # substr-of-PK sorts in both directions
    for r in ROWS2:
        engine.sql(
            "UPSERT INTO ob2 VALUES (" + ", ".join(f"'{v}'" for v in r) + ")"
        )
    for inner in ("order by pk2, pk3", "order by pk2 desc, pk3 desc"):
        got = col0(engine, (
            "select sub, v1 from (select substr(pk3,0,3) sub, pk2, v1 from "
            f"ob2 t where pk1 = 'b31' {inner} limit 10) a "
            "order by pk2 desc ,sub desc"
        ))
        assert got == ["b33", "b23", "b13", "a33", "a23", "a13"], inner
        got = col0(engine, (
            "select sub, v1 from (select substr(pk2,0,3) sub, pk3, v1 from "
            f"ob2 t where pk1 = 'b31' {inner} limit 10) a "
            "order by sub desc, pk3 desc"
        ))
        assert got == ["b32", "b22", "b12", "a32", "a22", "a12"], inner
