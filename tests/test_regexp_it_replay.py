"""RegexpReplaceFunctionIT / RegexpSubstrFunctionIT replay (end2end/) —
REGEXP_REPLACE's 2-arg removal form in GROUP BY keys and filters, and
REGEXP_SUBSTR's 1-based offset (positive and NEGATIVE = from-end) in
GROUP BY keys and filters."""

from __future__ import annotations

import pytest

from tests.conftest import SF_TEST_DIR


@pytest.fixture()
def engine(spark, tmp_path):
    from phoenix_spark.engine import Engine

    return Engine(spark, sf_dir=SF_TEST_DIR, warehouse=str(tmp_path / "wh"))


def rows(engine, sql):
    return [tuple(r) for r in engine.sql(sql).collect()]


def test_regexp_replace(engine):
    # RegexpReplaceFunctionIT.java:64-105
    engine.sql(
        "create table rr (id varchar not null primary key, uri varchar, "
        "appcpu integer)"
    )
    for i, (uri, cpu) in enumerate(
        [("Report11", 10), ("Report11", 10), ("Report22", 30), ("Report33", 30)],
        start=1,
    ):
        engine.sql(f"UPSERT INTO rr (id, uri, appcpu) values ('id{i}', '{uri}', {cpu})")
    got = rows(engine, (
        "select REGEXP_REPLACE(uri, '[1-3]+', '*') suburi, sum(appcpu) "
        "sumcpu from rr group by REGEXP_REPLACE(uri, '[1-3]+', '*')"
    ))
    assert got == [("Report*", 80)]
    # 2-arg form: replacement defaults to removal
    got = rows(engine, (
        "select REGEXP_REPLACE(uri, '[1-3]+') suburi, sum(appcpu) sumcpu "
        "from rr group by REGEXP_REPLACE(uri, '[1-3]+')"
    ))
    assert got == [("Report", 80)]
    got = rows(engine, (
        "select id from rr where REGEXP_REPLACE(uri, '[2-3]+', '*') = "
        "'Report*' ORDER BY id"
    ))
    assert [g[0] for g in got] == ["id3", "id4"]
    got = rows(engine, (
        "select id from rr where REGEXP_REPLACE(uri, '[2-3]+') = 'Report' "
        "ORDER BY id"
    ))
    assert [g[0] for g in got] == ["id3", "id4"]


def test_regexp_substr_offsets(engine):
    # RegexpSubstrFunctionIT.java:45-110 — default / positive / negative
    # 1-based offsets in GROUP BY keys
    engine.sql(
        "create table rsub (id varchar not null primary key, uri varchar, "
        "appcpu integer)"
    )
    for i, (uri, cpu) in enumerate(
        [("Report1?1", 10), ("Report1?2", 10), ("Report2?1", 30),
         ("Report3?2", 30)],
        start=1,
    ):
        engine.sql(
            f"UPSERT INTO rsub (id, uri, appcpu) values ('id{i}', '{uri}', {cpu})"
        )
    for off, prefix in (("", "Report"), (", 2", "eport"), (", -5", "rt")):
        got = sorted(rows(engine, (
            f"select REGEXP_SUBSTR(uri, '[^\\\\?]+'{off}) suburi, "
            "sum(appcpu) sumcpu from rsub "
            f"group by REGEXP_SUBSTR(uri, '[^\\\\?]+'{off})"
        )))
        assert got == [
            (f"{prefix}1", 20), (f"{prefix}2", 30), (f"{prefix}3", 30),
        ], off
    got = rows(engine, (
        "select id from rsub where "
        "REGEXP_SUBSTR(uri, '[^\\\\?]+', 2) = 'eport1' ORDER BY id"
    ))
    assert [g[0] for g in got] == ["id1", "id2"]
