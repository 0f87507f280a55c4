"""BaseOrderByIT replay (phoenix-core/src/it/.../BaseOrderByIT.java):
multi-column ORDER BY over ATABLE, || expressions in ORDER BY, the full
NULLS FIRST/LAST x ASC/DESC matrix over nullable row-key columns, and
PHOENIX-6999 (point lookup + ORDER BY over ASC- and DESC-sorted PKs)."""

from __future__ import annotations

import pytest

from tests.atable import ROWS, TENANT, create_atable
from tests.conftest import SF_TEST_DIR


@pytest.fixture()
def engine(spark, tmp_path):
    from phoenix_spark.engine import Engine

    return Engine(spark, sf_dir=SF_TEST_DIR, warehouse=str(tmp_path / "wh"))


def test_multi_order_by_expr(engine):
    # BaseOrderByIT.java:67-97 — B_STRING then ENTITY_ID
    create_atable(engine)
    rows = engine.sql(
        "SELECT ENTITY_ID, B_STRING FROM atable WHERE organization_id = ? "
        "ORDER BY B_STRING, ENTITY_ID",
        [TENANT],
    ).collect()
    want = [ROWS[i] for i in (0, 3, 6, 1, 4, 7, 2, 5, 8)]
    assert [r.ENTITY_ID for r in rows] == want


def test_desc_multi_order_by_expr(engine):
    # BaseOrderByIT.java:100-130 — ORDER BY B_STRING || ENTITY_ID DESC
    create_atable(engine, table="atable2")
    rows = engine.sql(
        "SELECT ENTITY_ID, B_STRING FROM atable2 WHERE organization_id = ? "
        "ORDER BY B_STRING || ENTITY_ID DESC",
        [TENANT],
    ).collect()
    want = [ROWS[i] for i in (8, 5, 2, 7, 4, 1, 6, 3, 0)]
    assert [r.ENTITY_ID for r in rows] == want


def test_nulls_last_with_desc(engine):
    # BaseOrderByIT.java:337-560 — the NULLS FIRST/LAST x ASC/DESC matrix
    # over nullable columns of a DESC-sorted row key
    engine.sql(
        "CREATE TABLE tnl (ORGANIZATION_ID VARCHAR, CONTAINER_ID VARCHAR, "
        "ENTITY_ID VARCHAR NOT NULL, CONSTRAINT TEST_PK PRIMARY KEY "
        "(ORGANIZATION_ID DESC, CONTAINER_ID DESC, ENTITY_ID))"
    )
    engine.sql("UPSERT INTO tnl VALUES ('a',null,'11')")
    engine.sql("UPSERT INTO tnl VALUES (null,'2','22')")
    engine.sql("UPSERT INTO tnl VALUES ('c','3','33')")

    def got(order):
        rows = engine.sql(
            f"SELECT CONTAINER_ID, ORGANIZATION_ID FROM tnl ORDER BY {order}"
        ).collect()
        return [(r.CONTAINER_ID, r.ORGANIZATION_ID) for r in rows]

    assert got("ORGANIZATION_ID ASC NULLS FIRST") == [("2", None), (None, "a"), ("3", "c")]
    assert got("ORGANIZATION_ID ASC NULLS LAST") == [(None, "a"), ("3", "c"), ("2", None)]
    assert got("ORGANIZATION_ID DESC NULLS FIRST") == [("2", None), ("3", "c"), (None, "a")]
    assert got("ORGANIZATION_ID DESC NULLS LAST") == [("3", "c"), (None, "a"), ("2", None)]
    assert got("CONTAINER_ID ASC NULLS FIRST") == [(None, "a"), ("2", None), ("3", "c")]
    assert got("CONTAINER_ID ASC NULLS LAST") == [("2", None), ("3", "c"), (None, "a")]
    assert got("CONTAINER_ID DESC NULLS FIRST") == [(None, "a"), ("3", "c"), ("2", None)]
    assert got("CONTAINER_ID DESC NULLS LAST") == [("3", "c"), ("2", None), (None, "a")]

    # the IT then adds an all-null row and checks two-column combinations
    engine.sql("UPSERT INTO tnl VALUES (null,null,'44')")
    assert got("ORGANIZATION_ID NULLS FIRST, CONTAINER_ID NULLS FIRST") == [
        (None, None), ("2", None), (None, "a"), ("3", "c")
    ]
    assert got("ORGANIZATION_ID NULLS FIRST, CONTAINER_ID NULLS LAST") == [
        ("2", None), (None, None), (None, "a"), ("3", "c")
    ]
    assert got("ORGANIZATION_ID NULLS LAST, CONTAINER_ID NULLS FIRST") == [
        (None, "a"), ("3", "c"), (None, None), ("2", None)
    ]


def test_phoenix_6999_point_lookup_order_by(engine):
    # BaseOrderByIT.java:1239-1297 — a point lookup stays correct under
    # ORDER BY on both ASC- and DESC-sorted primary keys
    engine.sql("CREATE TABLE t6999 (k1 varchar primary key, v1 varchar, v2 varchar)")
    engine.sql("CREATE TABLE t6999d (k1 varchar primary key desc, v1 varchar, v2 varchar)")
    for t in ("t6999", "t6999d"):
        for v in ("a", "b", "c"):
            engine.sql(f"upsert into {t} values ('{v}','{v}','{v}')")
    for t in ("t6999", "t6999d"):
        for d in ("asc", "desc"):
            rows = engine.sql(
                f"SELECT * from {t} where k1='b' order by k1 {d}"
            ).collect()
            assert len(rows) == 1 and rows[0].k1 == "b", (t, d)
