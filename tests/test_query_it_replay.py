"""QueryIT + BaseQueryIT + PointInTimeQueryIT replay
(end2end/QueryIT.java, BaseQueryIT.java, PointInTimeQueryIT.java).

QueryIT is the reference's basic SELECT matrix, parameterized by
BaseQueryIT.allIndexes(): each scenario runs under NO_INDEX plus the three
GLOBAL_INDEX_DDLS covered-index variants (a_integer DESC / (a_integer,
a_string) / a_integer, each INCLUDE (a_string, b_string, a_date)) — the
results must be identical regardless of which access path the optimizer
picks.  LOCAL index DDLs are an HBase region-colocation physicality with no
logical-plan counterpart here (SURVEY §1.1); the covered-index variants
exercise the same substitution surface.

Adaptations from the JDBC harness (documented per test):
  * testToDateOnString is a JDBC ResultSet.getDate() type-mismatch check
    (client-side accessor, not query semantics) — replayed as a schema
    assertion that a_string stays a string column.
  * Phoenix GROUP BY/DISTINCT output arrives ordered by the group key (the
    server merge-sorts); Spark's hash aggregate does not — replays add an
    explicit ORDER BY where the IT relies on the implicit order, which is
    the engine's documented sort-contract divergence (SURVEY §2.4).
  * PointInTimeQueryIT's CurrentSCN connection property maps to
    Engine.with_scn(commit_ts) — commit timestamps instead of wall-clock
    HBase cell timestamps; "query at a time between mutation A and B"
    becomes "with_scn(ts recorded after A, before B)".
"""

from __future__ import annotations

import pytest

from tests.atable import ROWS, TENANT, create_atable
from tests.conftest import SF_TEST_DIR

# BaseQueryIT.GLOBAL_INDEX_DDLS + NO_INDEX (BaseQueryIT.java:47-63)
INDEX_DDLS = [
    "",  # NO_INDEX
    "CREATE INDEX IF NOT EXISTS {ix} ON {t} (a_integer DESC) "
    "INCLUDE (A_STRING, B_STRING, A_DATE)",
    "CREATE INDEX IF NOT EXISTS {ix} ON {t} (a_integer, a_string) "
    "INCLUDE (B_STRING, A_DATE)",
    "CREATE INDEX IF NOT EXISTS {ix} ON {t} (a_integer) "
    "INCLUDE (A_STRING, B_STRING, A_DATE)",
]

A_VALUE, B_VALUE, C_VALUE, E_VALUE = "a", "b", "c", "e"
ROW5, ROW6, ROW7 = ROWS[4], ROWS[5], ROWS[6]


@pytest.fixture(scope="module")
def spark():
    from phoenix_spark.session import get_spark

    return get_spark(
        app_name="phoenix_spark_tests", master="local[8]", shuffle_partitions=8
    )


@pytest.fixture(scope="module", params=list(range(len(INDEX_DDLS))),
                ids=["no_index", "ix_desc", "ix_composite", "ix_asc"])
def engine(request, spark, tmp_path_factory):
    """One ATABLE per index variant, like BaseQueryIT.initTables."""
    from phoenix_spark.engine import Engine

    e = Engine(
        spark, sf_dir=SF_TEST_DIR,
        warehouse=str(tmp_path_factory.mktemp(f"qit_wh{request.param}")),
    )
    create_atable(e)
    ddl = INDEX_DDLS[request.param]
    if ddl:
        e.sql(ddl.format(ix=f"qit_ix{request.param}", t="atable"))
    return e


def rows(engine, sql):
    return [tuple(r) for r in engine.sql(sql).collect()]


# --- QueryIT.java ------------------------------------------------------------


def test_to_date_on_string(engine):
    # QueryIT.testToDateOnString:60 — rs.getDate() on a VARCHAR column is a
    # TYPE_MISMATCH; the query itself returns the string.  JDBC accessor
    # adaptation: pin that a_string resolves as a string column.
    df = engine.sql(
        f"SELECT a_string FROM atable WHERE organization_id='{TENANT}' "
        "and a_integer = 5"
    )
    assert dict(df.dtypes)["a_string"] == "string"
    assert [r.a_string for r in df.collect()] == [B_VALUE]


def test_column_on_both_sides(engine):
    # QueryIT.testColumnOnBothSides:80
    got = rows(engine, (
        f"SELECT entity_id FROM atable WHERE organization_id='{TENANT}' "
        "and a_string = b_string"
    ))
    assert got == [(ROW7,)]


def test_column_alias_mapping(engine):
    # QueryIT.testColumnAliasMapping:97 — the table NAME qualifies a column
    # even though the table carries an alias (FromCompiler binds both)
    got = rows(engine, (
        "SELECT a.a_string, atable.b_string FROM atable a "
        f"WHERE '{TENANT}'=organization_id and 5=a_integer "
        "ORDER BY a_string, b_string"
    ))
    assert got == [(B_VALUE, C_VALUE)]


def test_all_scan(engine):
    # QueryIT.testAllScan:115 — SELECT ALL is the explicit non-DISTINCT form
    got = rows(engine, (
        "SELECT ALL a_string, b_string FROM atable "
        f"WHERE '{TENANT}'=organization_id and 5=a_integer"
    ))
    assert got == [(B_VALUE, C_VALUE)]


def test_distinct_scan(engine):
    # QueryIT.testDistinctScan:133 — the IT reads a,b,c without ORDER BY
    # (Phoenix group-by output is key-ordered); ORDER BY added per module
    # docstring.
    got = rows(engine, (
        f"SELECT DISTINCT a_string FROM atable WHERE organization_id='{TENANT}' "
        "ORDER BY a_string"
    ))
    assert got == [(A_VALUE,), (B_VALUE,), (C_VALUE,)]


def test_distinct_limit_scan(engine):
    # QueryIT.testDistinctLimitScan:152 — LIMIT 1 over the key-ordered
    # distinct yields the smallest value
    got = rows(engine, (
        f"SELECT DISTINCT a_string FROM atable WHERE organization_id='{TENANT}' "
        "ORDER BY a_string LIMIT 1"
    ))
    assert got == [(A_VALUE,)]


# --- PointInTimeQueryIT.java (fresh table per test, like the IT) -------------


@pytest.fixture()
def pit_engine(spark, tmp_path):
    from phoenix_spark.engine import Engine

    e = Engine(spark, sf_dir=SF_TEST_DIR, warehouse=str(tmp_path / "wh"))
    create_atable(e)
    return e


def test_point_in_time_delete_ungrouped_aggregation(pit_engine):
    # PointInTimeQueryIT.testPointInTimeDeleteUngroupedAggregation:38
    e = pit_engine
    e.sql(
        "upsert into atable (ORGANIZATION_ID, ENTITY_ID, A_STRING) "
        f"VALUES ('{TENANT}', '{ROW7}', NULL)"
    )
    e.sql(
        f"delete from atable where organization_id='{TENANT}' "
        f"and entity_id='{ROW5}'"
    )
    scn = e.commit_ts("atable")
    # delete ROW6 AFTER the SCN — must be invisible to the query
    e.sql(
        f"delete from atable where organization_id='{TENANT}' "
        f"and entity_id='{ROW6}'"
    )
    got = e.with_scn(scn).sql(
        f"SELECT count(1) AS c FROM atable WHERE organization_id='{TENANT}' "
        f"and a_string = '{B_VALUE}'"
    ).collect()
    assert [r.c for r in got] == [2]


def test_point_in_time_grouped_aggregation(pit_engine):
    # PointInTimeQueryIT.TestPointInTimeGroupedAggregation:97
    e = pit_engine
    e.sql(f"upsert into atable VALUES ('{TENANT}','{ROW5}','{C_VALUE}')")
    scn = e.commit_ts("atable")
    e.sql(f"upsert into atable VALUES ('{TENANT}','{ROW5}','{E_VALUE}')")
    got = e.with_scn(scn).sql(
        "SELECT a_string, count(1) AS c FROM atable "
        f"WHERE organization_id='{TENANT}' GROUP BY a_string ORDER BY a_string"
    ).collect()
    assert [(r.a_string, r.c) for r in got] == [
        (A_VALUE, 4), (B_VALUE, 3), (C_VALUE, 2),
    ]


def test_point_in_time_ungrouped_aggregation(pit_engine):
    # PointInTimeQueryIT.TestPointInTimeUngroupedAggregation:143
    e = pit_engine
    stmt = (
        "upsert into atable (ORGANIZATION_ID, ENTITY_ID, A_STRING) "
        "VALUES ('{t}', '{r}', {v})"
    )
    e.sql(stmt.format(t=TENANT, r=ROW5, v="NULL"))
    e.sql(stmt.format(t=TENANT, r=ROW5, v=f"'{C_VALUE}'"))
    e.sql(stmt.format(t=TENANT, r=ROW7, v=f"'{E_VALUE}'"))
    scn = e.commit_ts("atable")
    e.sql(stmt.format(t=TENANT, r=ROW6, v=f"'{E_VALUE}'"))
    got = e.with_scn(scn).sql(
        f"SELECT count(1) AS c FROM atable WHERE organization_id='{TENANT}' "
        f"and a_string = '{B_VALUE}'"
    ).collect()
    # ROW5 b→c, ROW7 b→e: remaining 'b' rows are ROW6 and ROW8
    assert [r.c for r in got] == [2]


def test_point_in_time_ungrouped_limited_aggregation(pit_engine):
    # PointInTimeQueryIT.TestPointInTimeUngroupedLimitedAggregation:218 —
    # LIMIT applies to the single aggregate output row, so all rows count
    e = pit_engine
    stmt = (
        "upsert into atable (ORGANIZATION_ID, ENTITY_ID, A_STRING) "
        "VALUES ('{t}', '{r}', '{v}')"
    )
    e.sql(stmt.format(t=TENANT, r=ROW6, v=C_VALUE))
    e.sql(stmt.format(t=TENANT, r=ROW6, v=E_VALUE))
    e.sql(stmt.format(t=TENANT, r=ROW6, v=B_VALUE))
    e.sql(stmt.format(t=TENANT, r=ROW6, v=B_VALUE))
    scn = e.commit_ts("atable")
    e.sql(stmt.format(t=TENANT, r=ROW6, v=E_VALUE))
    got = e.with_scn(scn).sql(
        f"SELECT count(1) AS c FROM atable WHERE organization_id='{TENANT}' "
        f"and a_string = '{B_VALUE}' LIMIT 3"
    ).collect()
    assert [r.c for r in got] == [4]


def test_scn_connection_is_read_only(pit_engine):
    # CurrentSCN connections reject mutations (SQLExceptionCode
    # .CANNOT_UPSERT_WITH_SCN_SET / CANNOT_DELETE_WITH_SCN_SET)
    e = pit_engine.with_scn(pit_engine.commit_ts("atable"))
    with pytest.raises(ValueError, match="read-only"):
        e.sql(
            "upsert into atable (ORGANIZATION_ID, ENTITY_ID, A_STRING) "
            f"VALUES ('{TENANT}', '{ROW5}', 'x')"
        )
    with pytest.raises(ValueError, match="read-only"):
        e.sql(f"delete from atable where organization_id='{TENANT}'")
