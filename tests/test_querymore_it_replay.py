"""QueryMoreIT replay (end2end/QueryMoreIT.java) — the "query more"
pagination idioms: RVC OFFSET resume points over DESC primary keys
(RVCOffsetCompiler), single-DESC-column comparisons, duplicate projection
of one column, and NULL DECIMAL round-trips.  The chunked testQueryMore1-4
harness drives the same RVC-IN surface the InQueryIT/RVC replays cover;
the mutation-batch test is a client-buffer physicality.
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
    e = Engine(
        spark, sf_dir=SF_TEST_DIR,
        warehouse=str(tmp_path_factory.mktemp("qm_wh")),
    )
    e.sql(
        "CREATE TABLE page_snapshot (ORGANIZATION_ID CHAR(15) NOT NULL, "
        "SCORE DOUBLE NOT NULL, ENTITY_ID CHAR(15) NOT NULL, "
        "CONSTRAINT PAGE_SNAPSHOT_PK PRIMARY KEY (ORGANIZATION_ID, "
        "SCORE DESC, ENTITY_ID DESC)) MULTI_TENANT=TRUE"
    )
    for score, ent in ((3, "01"), (2, "04"), (2, "03"), (1, "02")):
        e.sql(f"UPSERT INTO page_snapshot VALUES ('org1',{score},'{ent}')")
    return e


def test_rvc_offset_on_desc_pk(engine):
    # QueryMoreIT.testRVCOnDescWithLeadingPKEquality:413 — resume AFTER
    # ('org1', 2, '04') in PK STORAGE order (score/entity DESC)
    got = engine.sql(
        "SELECT entity_id, score FROM page_snapshot "
        "ORDER BY ORGANIZATION_ID, score DESC, entity_id DESC LIMIT 3 "
        "OFFSET (ORGANIZATION_ID, SCORE, ENTITY_ID)=('org1', 2, '04')"
    ).collect()
    assert [(r.entity_id.strip(), r.score) for r in got] == [
        ("03", 2.0), ("02", 1.0),
    ]
    # same with an explicit leading-PK equality in the WHERE
    got = engine.sql(
        "SELECT entity_id, score FROM page_snapshot "
        "WHERE ORGANIZATION_ID='org1' "
        "ORDER BY organization_id, score DESC, entity_id DESC LIMIT 3 "
        "OFFSET (ORGANIZATION_ID, SCORE, ENTITY_ID)=('org1', 2, '04')"
    ).collect()
    assert [(r.entity_id.strip(), r.score) for r in got] == [
        ("03", 2.0), ("02", 1.0),
    ]


def test_rvc_offset_requires_full_pk(engine):
    # RVCOffsetCompiler rejects a partial-PK offset
    with pytest.raises(ValueError, match="full primary key"):
        engine.sql(
            "SELECT entity_id FROM page_snapshot LIMIT 3 "
            "OFFSET (ORGANIZATION_ID, SCORE)=('org1', 2)"
        )


def test_single_desc_pk_column_comparison(engine):
    # QueryMoreIT.testSingleDescPKColumnComparison:458 — `score > 2.0` keeps
    # its logical meaning over the DESC-stored column
    got = engine.sql(
        "SELECT entity_id, score FROM page_snapshot "
        "WHERE organization_id = 'org1' AND score > 2.0 "
        "ORDER BY score DESC LIMIT 3"
    ).collect()
    assert [(r.entity_id.strip(), r.score) for r in got] == [("01", 3.0)]


def test_select_column_more_than_once(engine):
    # QueryMoreIT.testSelectColumnMoreThanOnce:371
    got = engine.sql(
        "SELECT score AS s1, score AS s2 FROM page_snapshot "
        "WHERE entity_id = '01' LIMIT 1"
    ).collect()
    assert [(r.s1, r.s2) for r in got] == [(3.0, 3.0)]


def test_null_decimal_roundtrip(engine):
    # QueryMoreIT.testNullBigDecimalWithScale:384
    engine.sql(
        'CREATE TABLE qm_dec (PK VARCHAR(15) NOT NULL, "DEC" DECIMAL, '
        "CONSTRAINT TABLE_PK PRIMARY KEY (PK))"
    )
    n = engine.sql('UPSERT INTO qm_dec (PK, "DEC") VALUES(\'key\', NULL)')
    assert n == 1
    got = engine.sql("SELECT * FROM qm_dec").collect()
    assert len(got) == 1 and got[0][0] == "key" and got[0][1] is None
