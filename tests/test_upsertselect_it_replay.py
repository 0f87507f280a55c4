"""UpsertSelectIT replay (end2end/UpsertSelectIT.java) — the UPSERT SELECT
surface: same-table self-reads (the source is the PRE-write state),
same-PK overwrites through expressions, DESC-key tables, LIMITed sources
with partial column lists (explicit CAST(null) overwrites only the
selected rows' cells), ordered sources feeding a different-keyed table,
and sequences over a SELECT source."""

from __future__ import annotations

import pytest

from tests.conftest import SF_TEST_DIR


@pytest.fixture()
def engine(spark, tmp_path):
    from phoenix_spark.engine import Engine

    return Engine(spark, sf_dir=SF_TEST_DIR, warehouse=str(tmp_path / "wh"))


def rows(engine, sql):
    return [tuple(r) for r in engine.sql(sql).collect()]


def test_upsert_select_same_table(engine):
    # UpsertSelectIT.java:560 — the source reads pre-write state
    engine.sql("create table usl (i integer not null primary key)")
    n = engine.sql("UPSERT INTO usl VALUES(1)")
    assert n == 1
    n = engine.sql("UPSERT INTO usl select i+1 from usl")
    assert n == 1
    assert rows(engine, "SELECT i FROM usl ORDER BY i") == [(1,), (2,)]


def test_upsert_select_run_on_server(engine):
    # UpsertSelectIT.java:598 — same-PK expression overwrites on a DESC key
    engine.sql(
        "create table usr (i integer not null primary key desc, j integer)"
    )
    assert engine.sql("UPSERT INTO usr VALUES(1, 1)") == 1
    assert rows(engine, "SELECT i, j+1 FROM usr") == [(1, 2)]
    assert engine.sql("UPSERT INTO usr(i,j) select i, j+1 from usr") == 1
    assert rows(engine, "SELECT j FROM usr") == [(2,)]
    assert engine.sql("UPSERT INTO usr(i,j) select i, i from usr") == 1
    assert rows(engine, "SELECT j FROM usr") == [(1,)]


def test_upsert_select_desc_to_asc(engine):
    # UpsertSelectIT.java:666
    engine.sql(
        "create table usd (i integer not null primary key desc, j integer)"
    )
    engine.sql("UPSERT INTO usd VALUES(1, 1)")
    assert engine.sql("UPSERT INTO usd (i,j) select i+1, j+1 from usd") == 1
    assert rows(engine, "SELECT i, j FROM usd ORDER BY i") == [(1, 1), (2, 2)]


def test_upsert_select_with_limit(engine):
    # UpsertSelectIT.java:758 — LIMITed source + partial columns: the
    # explicit CAST(null AS timestamp) clears ts for ONE selected row only
    engine.sql(
        "create table uslim (id varchar(10) not null primary key, "
        "val varchar(10), ts timestamp)"
    )
    for k, v in (("aaa", "abc"), ("bbb", "bcd"), ("ccc", "cde")):
        engine.sql(f"upsert into uslim values ('{k}', '{v}', current_date())")
    got = rows(engine, "select * from uslim ORDER BY id")
    assert [(r[0], r[1], r[2] is not None) for r in got] == [
        ("aaa", "abc", True), ("bbb", "bcd", True), ("ccc", "cde", True),
    ]
    engine.sql(
        "upsert into uslim (id, ts) select id, CAST(null AS timestamp) "
        "from uslim where id <= 'bbb' order by id limit 1"
    )
    got = rows(engine, "select * from uslim ORDER BY id")
    assert [(r[0], r[1], r[2] is not None) for r in got] == [
        ("aaa", "abc", False), ("bbb", "bcd", True), ("ccc", "cde", True),
    ]


def test_upsert_select_with_order_by(engine):
    # UpsertSelectIT.java:829 — the ordered source feeds a table keyed by
    # the constant column, so every row collapses to one latest-wins PK
    engine.sql(
        "create table usob1 (c1 char(3) not null primary key, c2 char(3), "
        "c3 char(3)) SALT_BUCKETS=16"
    )
    engine.sql(
        "create table usob2 (cc1 char(3) not null primary key, cc2 char(3), "
        "cc3 char(3)) SALT_BUCKETS=16"
    )
    for i in range(0, 65):  # reference uses 513 rows; 65 keeps the shape
        engine.sql(
            f"upsert into usob1 values ('{i:03d}','a','{64 - i:03d}')"
        )
    engine.sql(
        "upsert into usob2 (cc1,cc2,cc3) select c2,c1,c3 from usob1 "
        "order by c3"
    )
    got = rows(engine, "select * from usob2")
    assert len(got) == 1
    r = got[0]
    assert (r[0].rstrip(), r[1].rstrip(), r[2].rstrip()) == ("a", "000", "064")


def test_upsert_select_with_sequence(engine):
    # UpsertSelectIT.java:887
    engine.sql("create table usq1 (id bigint not null primary key, v varchar)")
    engine.sql("create table usq2 (k varchar primary key)")
    engine.sql("create sequence usq_seq")
    for k in ("a", "b", "c"):
        engine.sql(f"upsert into usq2 values ('{k}')")
    engine.sql("upsert into usq1 select next value for usq_seq, k from usq2")
    got = rows(engine, "select * from usq1 ORDER BY id")
    assert [g[0] for g in got] == [1, 2, 3]
    assert sorted(g[1] for g in got) == ["a", "b", "c"]
