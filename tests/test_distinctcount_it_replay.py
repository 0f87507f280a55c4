"""DistinctCountIT replay over the shared ATABLE fixture
(phoenix-core/src/it/.../DistinctCountIT.java; queries verbatim, results
asserted against the IT's expected values)."""

from __future__ import annotations

import pytest

from tests.atable import TENANT, TENANT2, create_atable
from tests.conftest import SF_TEST_DIR


@pytest.fixture()
def engine(spark, tmp_path):
    from phoenix_spark.engine import Engine

    return Engine(spark, sf_dir=SF_TEST_DIR, warehouse=str(tmp_path / "wh"))


@pytest.fixture()
def atable(engine):
    create_atable(engine, tenant2=TENANT2)
    # DistinctCountIT ships its OWN initATableValues (java:274-428) whose
    # B_STRING column differs from BaseTest's: rows 3,6,7,9 hold C_VALUE —
    # giving the distinct sets {b,c} and per-A_STRING counts a→2, b→1, c→1
    # the IT asserts.  Partial upserts patch just that cell.
    from tests.atable import ROWS

    for i in (2, 5, 6, 8):  # ROW3, ROW6, ROW7, ROW9
        engine.sql(
            "upsert into atable (organization_id, entity_id, b_string) "
            f"values ('{TENANT}', '{ROWS[i]}', 'c')"
        )
    return engine


def _one(engine, sql, params=None):
    return engine.sql(sql, params).collect()[0][0]


def test_distinct_count_on_column(atable):
    # DistinctCountIT.java:56-73 (tenant1 rows only: a,a,a,a,b,b,b,b,c = 3)
    assert _one(
        atable,
        "SELECT count(DISTINCT A_STRING) AS c FROM atable WHERE organization_id = ?",
        [TENANT],
    ) == 3


def test_distinct_count_on_rk_column(atable):
    # DistinctCountIT.java:76-94 — two organizations present
    assert _one(atable, "SELECT count(DISTINCT ORGANIZATION_ID) AS c FROM atable") == 2


def test_distinct_count_with_group_by(atable):
    # DistinctCountIT.java:97-123
    rows = atable.sql(
        "SELECT A_STRING, count(DISTINCT B_STRING) AS c FROM atable "
        "WHERE organization_id = ? group by A_STRING ORDER BY A_STRING",
        [TENANT],
    ).collect()
    assert [(r.A_STRING, r.c) for r in rows] == [("a", 2), ("b", 1), ("c", 1)]


def test_distinct_count_with_group_by_and_order_by_desc(atable):
    # DistinctCountIT.java:126-152
    rows = atable.sql(
        "SELECT A_STRING, count(DISTINCT B_STRING) AS c FROM atable "
        "WHERE organization_id = ? group by A_STRING order by A_STRING desc",
        [TENANT],
    ).collect()
    assert [(r.A_STRING, r.c) for r in rows] == [("c", 1), ("b", 1), ("a", 2)]


def test_distinct_count_order_by_distinct_count_alias(atable):
    # DistinctCountIT.java:155-181 — ORDER BY the aggregate's alias
    rows = atable.sql(
        "SELECT A_STRING, count(DISTINCT B_STRING) as COUNT_B_STRING FROM atable "
        "WHERE organization_id = ? group by A_STRING "
        "order by COUNT_B_STRING, A_STRING",
        [TENANT],
    ).collect()
    assert [(r.A_STRING, r.COUNT_B_STRING) for r in rows] == [
        ("b", 1), ("c", 1), ("a", 2),
    ]


def test_distinct_count_with_group_by_ordered_two_tenants(atable):
    # DistinctCountIT.java:184-208 — tenant2 has ROW1/ROW2 (both a_string='a')
    rows = atable.sql(
        "SELECT organization_id, count(DISTINCT A_STRING) AS c FROM atable "
        "group by organization_id ORDER BY organization_id"
    ).collect()
    assert [(r.organization_id, r.c) for r in rows] == [(TENANT, 3), (TENANT2, 1)]


def test_distinct_count_on_2_columns(atable):
    # DistinctCountIT.java:211-230
    r = atable.sql(
        "SELECT count(DISTINCT A_STRING) AS a, count(DISTINCT B_STRING) AS b "
        "FROM atable WHERE organization_id = ?",
        [TENANT],
    ).collect()[0]
    assert (r.a, r.b) == (3, 2)


def test_distinct_count_one(atable):
    # DistinctCountIT.java:233-251 — count(DISTINCT 1) over 11 rows = 1
    assert _one(atable, "SELECT count(DISTINCT 1) AS c FROM atable") == 1


def test_distinct_count_one_with_empty_result(engine):
    # DistinctCountIT.java:254-271 — empty table: count(DISTINCT 1) = 0
    create_atable(engine, table="empty_atable")
    engine.sql("DELETE FROM empty_atable")
    assert _one(engine, "SELECT count(DISTINCT 1) AS c FROM empty_atable") == 0


def test_distinct_count_limit_bug_5217(engine):
    # DistinctCountIT.java:469-490 — LIMIT applies AFTER the ungrouped agg
    engine.sql(
        "create table t5217 (pk1 integer not null, pk2 integer not null, "
        "v integer, CONSTRAINT TEST_PK PRIMARY KEY (pk1,pk2))"
    )
    engine.sql("UPSERT INTO t5217(pk1,pk2,v) VALUES (1,1,1)")
    engine.sql("UPSERT INTO t5217(pk1,pk2,v) VALUES (2,2,2)")
    assert _one(engine, "select count(distinct pk1) AS c from t5217 limit 1") == 2
