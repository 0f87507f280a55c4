"""SkipScanQueryIT replay (end2end/SkipScanQueryIT.java) — the semantic
subset of the skip-scan matrix: IN-list point intersections over composite
PKs, cross-product and parallel-list IN shapes, range × IN intersection,
DESC key components, OR-of-PK with AND-of-non-PK, and NULL components in
nullable middle PK columns (the reference allows '' / unset in a NULLABLE
PK column — PTableImpl rejects only NOT NULL ones).

Pre-split/region/multi-column-family scenarios are HBase physicalities;
their logical shapes (filters + results) are what replays here.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_TEST_DIR


@pytest.fixture(scope="module")
def engine(tmp_path_factory):
    from phoenix_spark.engine import Engine
    from phoenix_spark.session import get_spark

    spark = get_spark(
        app_name="phoenix_spark_tests", master="local[8]", shuffle_partitions=8
    )
    return Engine(
        spark, sf_dir=SF_TEST_DIR,
        warehouse=str(tmp_path_factory.mktemp("sk_wh")),
    )


def rows(engine, sql):
    return [tuple(r) for r in engine.sql(sql).collect()]


def test_skip_scan_filter_query(engine):
    # SkipScanQueryIT.testSkipScanFilterQuery:137 — IN + point components;
    # col3 is upserted as '' (NULL) into a NULLABLE middle PK column
    engine.sql(
        "CREATE TABLE sk1 (col1 VARCHAR, col2 VARCHAR, col3 VARCHAR, "
        "col4 VARCHAR, CONSTRAINT pk PRIMARY KEY (col1,col2,col3,col4))"
    )
    for c1 in ("a", "e.f", "f"):
        engine.sql(f"upsert into sk1 values('{c1}','b','','1')")
    got = rows(engine, (
        "SELECT col1, col2, col3, col4 FROM sk1 WHERE col1 IN ('a','e','f') "
        "AND col2 = 'b' AND col4 = '1' ORDER BY col1"
    ))
    assert [g[0] for g in got] == ["a", "f"]
    assert all(g[2] is None for g in got)  # '' stored as NULL


def test_select_after_upsert(engine):
    # testSelectAfterUpsertInQuery:171 — aggregate over a skip-scan slice;
    # the NULL-sum branch exercises CASE WHEN ... IS NULL
    engine.sql(
        "create table sk2 (c1 VARCHAR NOT NULL, c2 VARCHAR NOT NULL, "
        "c3 VARCHAR NOT NULL, c4 VARCHAR NOT NULL, v1 integer, v2 integer, "
        "CONSTRAINT PK PRIMARY KEY (c1, c2, c3, c4))"
    )
    engine.sql("upsert into sk2(c1, c2, c3, c4, v1, v2) "
               "values('1001', '91', 's1', '2013-09-26', 28397, 23541)")
    engine.sql("upsert into sk2(c1, c2, c3, c4, v1, v2) "
               "values('1001', '91', 's2', '2013-09-23', 3369, null)")
    got = rows(engine, (
        "SELECT case when sum(v2)*1.0/sum(v1) is null then 0 else "
        "sum(v2)*1.0/sum(v1) END AS val FROM sk2 WHERE c1='1001' AND "
        "c2 = '91' AND c3 IN ('s1','s2') AND c4='2013-09-24'"
    ))
    assert len(got) == 1 and int(got[0][0]) == 0


def test_int_in_query(engine):
    # testInQuery:189
    engine.sql("CREATE TABLE sk3 (i INTEGER NOT NULL PRIMARY KEY)")
    for i in (2, 7, 10):
        engine.sql(f"UPSERT INTO sk3 VALUES({i})")
    got = rows(engine, "SELECT i FROM sk3 WHERE i IN (1,2,4,5,7,8,10) ORDER BY i")
    assert [g[0] for g in got] == [2, 7, 10]


def test_varchar_parallel_list_in(engine):
    # testVarCharParallelListInQuery:210 — zipped (not cross-product) rows;
    # one row carries a NULL trailing PK component
    engine.sql("CREATE TABLE sk4 (s1 VARCHAR, s2 VARCHAR, "
               "CONSTRAINT pk PRIMARY KEY (s1,s2))")
    for s1, s2 in (("d", "m"), ("da", "mc"), ("db", "tt")):
        engine.sql(f"UPSERT INTO sk4 VALUES('{s1}','{s2}')")
    got = rows(engine, (
        "SELECT s1,s2 FROM sk4 WHERE s1 IN ('a','b','da','db') AND "
        "s2 IN ('c','ma','m','mc','ttt','z')"
    ))
    assert got == [("da", "mc")]


@pytest.fixture(scope="module")
def cross_table(engine):
    engine.sql("CREATE TABLE sk5 (s1 VARCHAR, s2 VARCHAR, "
               "CONSTRAINT pk PRIMARY KEY (s1,s2))")
    for s1 in ("d", "da", "db"):
        for s2 in ("m", "mc", "tt"):
            engine.sql(f"UPSERT INTO sk5 VALUES('{s1}','{s2}')")
    return "sk5"


def test_varchar_cross_product_in(engine, cross_table):
    # testVarCharXInQuery:230
    got = rows(engine, (
        f"SELECT s1,s2 FROM {cross_table} WHERE s1 IN ('a','b','da','db') "
        "AND s2 IN ('c','ma','m','mc','ttt','z') ORDER BY s1, s2"
    ))
    assert got == [("da", "m"), ("da", "mc"), ("db", "m"), ("db", "mc")]


def test_varchar_cross_product_in_plus_range(engine, cross_table):
    # testVarCharXIntInQuery:259 — IN lists intersected with ranges
    got = rows(engine, (
        f"SELECT s1,s2 FROM {cross_table} WHERE s1 IN ('a','b','da','db') "
        "AND s2 IN ('c','ma','m','mc','ttt','z') "
        "AND s1 > 'd' AND s1 < 'db' AND s2 > 'm'"
    ))
    assert got == [("da", "mc")]


def test_in_with_desc_key(engine):
    # testInWithDescKey:316 — ranges + RVC IN over a DESC second key
    engine.sql(
        "create table sk6 (key_1 char(3) not null, key_2 char(4) not null, "
        "v varchar(8), CONSTRAINT pk PRIMARY KEY (key_1,key_2 desc))"
    )
    for k1, k2, v in (("000", "aaaa", "value_1"), ("000", "aabb", "value_2"),
                      ("100", "aacc", "value_3"), ("100", "aadd", "value_4"),
                      ("200", "aaee", "value_5"), ("201", "aaff", "value_6")):
        engine.sql(f"upsert into sk6 values('{k1}','{k2}','{v}')")
    got = rows(engine, (
        "select * from sk6 where key_1>='000' and key_1<'200' and "
        "key_2>='aabb' and key_2<'aadd' ORDER BY key_1"
    ))
    assert [(g[0], g[1], g[2]) for g in got] == [
        ("000", "aabb", "value_2"), ("100", "aacc", "value_3"),
    ]
    # the IT reads these in storage order (key_2 desc); ORDER BY added
    got = rows(engine, (
        "select * from sk6 where (key_1,key_2) in (('100','aacc'),"
        "('100','aadd')) ORDER BY key_1, key_2 DESC"
    ))
    assert [(g[0], g[1], g[2]) for g in got] == [
        ("100", "aadd", "value_4"), ("100", "aacc", "value_3"),
    ]


def test_or_pk_with_and_non_pk(engine):
    # testOrPKWithAndNonPK:473
    engine.sql("create table sk7 (ID varchar NOT NULL, company varchar, "
               "CONSTRAINT pk PRIMARY KEY (ID))")
    for i, c in (("i1", "c1"), ("i2", "c2"), ("i3", "c3")):
        engine.sql(f"upsert into sk7 values('{i}','{c}')")
    got = rows(engine, (
        "select * from sk7 where ID = 'i1' or (ID = 'i2' and company = 'c3')"
    ))
    assert got == [("i1", "c1")]


def test_null_middle_pk_component(engine):
    # testNullInfiniteLoop:496 — an upsert that OMITS a nullable middle PK
    # column; the range + point filter must not loop/return it
    # (column-family prefix SPAN. dropped: families are physical grouping)
    engine.sql(
        "create table sk8 (CREATETIME VARCHAR, ACCOUNTID VARCHAR, "
        "SERVICENAME VARCHAR, APPID VARCHAR, "
        "CONSTRAINT pk PRIMARY KEY(CREATETIME,ACCOUNTID,SERVICENAME))"
    )
    engine.sql("upsert into sk8(CREATETIME,SERVICENAME,APPID) "
               "values('20160116141006','servlet','android')")
    engine.sql("upsert into sk8(CREATETIME,ACCOUNTID,SERVICENAME,APPID) "
               "values('20160116151006','2404787','jdbc','ios')")
    got = rows(engine, (
        "select * from sk8 where CREATETIME>='20160116121006' and "
        "CREATETIME<='20160116181006' and ACCOUNTID='2404787'"
    ))
    assert len(got) == 1 and got[0][1] == "2404787"
