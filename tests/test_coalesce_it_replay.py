"""CoalesceFunctionIT replay (end2end/CoalesceFunctionIT.java) — COALESCE
over aggregate results (SUM of an all-NULL group), expression second
parameters, composition with NTH_VALUE ... WITHIN GROUP (the ordered-set
rewrite inside another function's argument list), and the quoted reserved
column name \"COUNT\"."""

from __future__ import annotations

import pytest

from tests.atable import ROWS, TENANT
from tests.conftest import SF_TEST_DIR


@pytest.fixture()
def engine(spark, tmp_path):
    from phoenix_spark.engine import Engine

    return Engine(spark, sf_dir=SF_TEST_DIR, warehouse=str(tmp_path / "wh"))


def one(engine, sql):
    rows = engine.sql(sql).collect()
    assert len(rows) == 1
    return rows[0]


def test_coalesce_over_atable(engine, tmp_path):
    # CoalesceFunctionIT.java:51 — x_integer is NULL for a_integer=6,
    # 5 for a_integer=7
    from tests.atable import create_atable

    create_atable(engine)
    got = [
        tuple(r)
        for r in engine.sql(
            "SELECT entity_id, a_integer + COALESCE(x_integer, 1) AS v "
            f"FROM atable WHERE organization_id = '{TENANT}' "
            "AND a_integer >= 6 AND a_integer <= 7 ORDER BY entity_id"
        ).collect()
    ]
    assert got == [(ROWS[5], 7), (ROWS[6], 12)]


def test_coalesce_with_sum(engine):
    # CoalesceFunctionIT.java:75-138 — SUM over an all-NULL group is NULL;
    # COALESCE substitutes (explicit cast, bare literal, and an aggregate
    # expression as the fallback)
    engine.sql(
        'CREATE TABLE coal (ID BIGINT NOT NULL, "COUNT" BIGINT '
        "CONSTRAINT pk PRIMARY KEY(ID))"
    )
    engine.sql('UPSERT INTO coal (ID, "COUNT") VALUES(2, null)')
    r = one(engine, (
        'SELECT COALESCE(SUM("COUNT"), CAST(0 AS BIGINT)) AS v FROM coal '
        "GROUP BY ID"
    ))
    assert r[0] == 0
    r = one(engine, 'SELECT COALESCE(SUM("COUNT"), 0) AS v FROM coal GROUP BY ID')
    assert r[0] == 0
    r = one(engine, (
        'SELECT COALESCE(SUM("COUNT"), SUM(ID)) AS v FROM coal GROUP BY ID'
    ))
    assert r[0] == 2


def test_coalesce_with_nth_value_within_group(engine):
    # CoalesceFunctionIT.java:141-189 — the ordered-set aggregate rewrite
    # must compose inside COALESCE's argument list; NTH_VALUE(_, 100) over
    # a 1-row group is NULL → the fallback wins
    engine.sql(
        'CREATE TABLE coal2 (ID BIGINT NOT NULL, "COUNT" BIGINT '
        "CONSTRAINT pk PRIMARY KEY(ID))"
    )
    engine.sql('UPSERT INTO coal2 (ID, "COUNT") VALUES(2, null)')
    r = one(engine, (
        'SELECT COALESCE(NTH_VALUE("COUNT", 100) WITHIN GROUP '
        '(ORDER BY "COUNT" DESC), 0) AS v FROM coal2 GROUP BY ID'
    ))
    assert r[0] == 0
    engine.sql(
        'CREATE TABLE coal3 (ID BIGINT NOT NULL, "COUNT" UNSIGNED_INT '
        "CONSTRAINT pk PRIMARY KEY(ID))"
    )
    engine.sql('UPSERT INTO coal3 (ID, "COUNT") VALUES(2, null)')
    r = one(engine, (
        'SELECT COALESCE(NTH_VALUE("COUNT", 100) WITHIN GROUP '
        '(ORDER BY "COUNT" DESC), 1) AS v FROM coal3 GROUP BY ID'
    ))
    assert r[0] == 1
