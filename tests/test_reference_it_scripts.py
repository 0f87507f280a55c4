"""Run the reference's IT fixture SQL scripts end-to-end through Engine.sql.

The reference's upgrade/IT harness replays the scenario scripts in
phoenix-core/src/it/resources/sql_files/ (create → add-data → query) over
a live cluster.  Executing the SAME files here pins a broad slab of
catalog surface in one sweep: schema-qualified names in every statement
position, views with added/view-constant columns, UPSERT through views,
diverged views (ALTER VIEW DROP COLUMN of a parent column), view indexes,
ALTER INDEX ... REBUILD ALL ASYNC + SYSTEM.TASK, SYSTEM.CATALOG metadata
queries, SALT_BUCKETS/IMMUTABLE_ROWS/MULTI_TENANT/SPLIT ON/VERSIONS table
options, OFFSET without ORDER BY, and DISTINCT-over-GROUP-BY.

Expected values are computed from the scripts' literal data by the
documented semantics (e.g. an UPSERT through a view auto-fills the view's
equality constants — UpsertCompiler viewConstants), so every assertion is
independent of this engine's implementation.
"""

from __future__ import annotations

import os
import re

import pytest

from phoenix_spark.engine import Engine

SQL_DIR = "/root/reference/phoenix-core/src/it/resources/sql_files"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SQL_DIR), reason="reference IT sql_files not present"
)


def _statements(path: str) -> list[str]:
    text = open(path).read()
    text = re.sub(r"/\*.*?\*/", "", text, flags=re.S)  # license headers
    out = []
    for raw in text.split(";"):
        stmt = "\n".join(
            line
            for line in raw.splitlines()
            if not line.strip().startswith("--")
        ).strip()
        if stmt:
            out.append(stmt)
    return out


def _run(engine: Engine, *files: str) -> list:
    results = []
    for f in files:
        for stmt in _statements(f"{SQL_DIR}/{f}.sql"):
            results.append(engine.sql(stmt))
    return results


@pytest.fixture()
def engine(spark, tmp_path):
    return Engine(spark, warehouse=str(tmp_path / "wh"))


def test_create_add_and_views(engine):
    """create_add.sql + add_data.sql + query_add_data.sql: tables with
    VERSIONS/IMMUTABLE_ROWS options, views over schema-qualified parents,
    and UPSERTs THROUGH views (each fills its view constant name=...)."""
    _run(engine, "create_add", "add_data")
    res = _run(engine, "query_add_data")
    # my_table: a,b (create) + c (via view in create_add) + x (upsert) +
    # y,d (via first view) + z (via second view) = 7 rows
    assert res[0].collect()[0][0] == 7
    rows = {(r[0], r[1]) for r in res[1].collect()}
    assert rows == {
        ("a", "a_name"),
        ("b", "b_name"),
        ("c", "a_name"),  # view constant name='a_name' auto-filled
        ("x", "a_name"),
        ("y", "a_name"),
        ("z", "b_name"),  # second view's constant
        ("d", "a_name"),
    }
    assert {r[0] for r in res[2].collect()} == {"a", "c", "x", "y", "d"}
    assert {r[0] for r in res[3].collect()} == {"b", "z"}
    assert res[4].collect()[0][0] == 3  # immutable: a, b, x
    assert {(r[0], r[1]) for r in res[5].collect()} == {
        ("a", "a_name"),
        ("b", "b_name"),
        ("x", "x_name"),
    }


def test_add_delete_full_cycle(engine):
    """add_delete.sql + query_add_delete.sql: SALT_BUCKETS table, DELETE
    all, DROP, then re-create inside the query script (the reference's
    delete/re-create cycle)."""
    _run(engine, "create_add", "add_delete")
    res = _run(engine, "query_add_delete")
    assert res[-2].collect()[0][0] == 4  # my_table: a, b, c (via view), y
    assert res[-1].collect()[0][0] == 3  # immutable: a, b, y


def test_distinct(engine):
    _run(engine, "create_distinct")
    res = _run(engine, "query_distinct")
    assert res[0].collect()[0][0] == 12
    got = [(r[0], r[1]) for r in res[1].collect()]
    assert got == [
        ("a", "1"),
        ("a", "2"),
        ("b", "1"),
        ("b", "2"),
        ("c", "1"),
        ("c", "2"),
    ]


def test_offset_without_order(engine):
    """OFFSET with no ORDER BY: the cut is engine-arbitrary, the count is
    not (22 qualifying rows, skip 11)."""
    _run(engine, "create_offset")
    res = _run(engine, "query_offset")
    assert res[0].collect()[0][0] == 25
    assert len(res[1].collect()) == 11


def test_orderby_nonpk(engine):
    _run(engine, "create_orderby_nonpk")
    res = _run(engine, "query_orderby_nonpk")
    assert res[0].collect()[0][0] == 25
    data = {  # SCHEMA_0003.TABLE_0003 literals from the script
        "id1": 10, "id2": 20, "id3": 30, "id4": 40, "id5": 50,
        "id6": 30, "id7": 20, "id8": 10, "id9": 40, "id10": 50,
        "id11": 50, "id12": 40, "id13": 30, "id14": 20, "id15": 10,
        "id16": 20, "id17": 30, "id18": 30, "id19": 40, "id20": 50,
        "id21": 10, "id22": 30, "id23": 40, "id24": 22, "id25": 33,
    }
    want = sorted(
        (
            (i, f"col{i[2:]}", v)
            for i, v in data.items()
            if v > 25
        ),
        key=lambda t: (t[2], t[1]),
    )
    got = [(r[0], r[1], r[2]) for r in res[1].collect()]
    assert got == want


def test_unordered_groupby(engine):
    _run(engine, "create_unorder_groupby")
    res = _run(engine, "query_unorder_groupby")
    assert res[0].collect()[0][0] == 21
    vals = [10, 20, 30, 40, 50, 30, 20, 10, 40, 50, 50, 40, 30, 20, 10,
            20, 30, 30, 40, 50, 10]
    from collections import Counter

    want = sorted(
        (v, c) for v, c in Counter(vals).items() if v > 25
    )
    got = [(r[0], r[1]) for r in res[1].collect()]
    assert got == want


def test_ordered_groupby_distinct_over_agg(engine):
    """query_ordered_groupby.sql: SELECT DISTINCT ID1, MAX(COL2) ...
    GROUP BY ID1, ID2 ORDER BY ID1, ID2 — DISTINCT collapses the per-ID2
    groups after aggregation."""
    _run(engine, "create_ordered_groupby")
    res = _run(engine, "query_ordered_groupby")
    assert res[0].collect()[0][0] == 24
    got = {(r[0], r[1]) for r in res[1].collect()}
    # every (ID1, ID2) group is one base row, so MAX(COL2) is the row's own
    # COL2; DISTINCT keeps the unique (ID1, COL2) pairs of the script data
    rows = [
        ("id1", 10), ("id2", 20), ("id3", 30), ("id4", 40), ("id5", 50),
        ("id6", 60), ("id7", 70), ("id8", 80), ("id9", 90), ("id10", 100),
        ("id1", 10), ("id2", 20), ("id3", 30), ("id4", 40), ("id5", 50),
        ("id6", 60), ("id7", 70), ("id8", 80), ("id9", 90), ("id10", 100),
        ("id11", 111), ("id12", 112), ("id3", 35), ("id2", 25),
    ]
    assert got == set(rows)


def test_diverged_view(engine):
    """create_diverged_view.sql: UPSERT through a view restating its view
    constant (B=200 — allowed, it matches), then ALTER VIEW DROP COLUMN of
    a PARENT column diverges the view from the base."""
    _run(engine, "create_diverged_view")
    res = _run(engine, "query_create_diverged_view")
    assert res[0].collect()[0][0] == 1  # S.T
    assert res[1].collect()[0][0] == 1  # S.V
    t_row = res[2].collect()[0]
    assert (t_row.a, t_row.b, t_row.c, t_row.d) == (2, 200, "def", -20)
    v_row = res[3].collect()[0]
    assert "c" not in v_row.__fields__  # dropped through the view
    assert (v_row.a, v_row.b, v_row.d, v_row.va, v_row.vb) == (
        2, 200, -20, 91, 101,
    )


def test_view_index_and_system_catalog(engine):
    """add_view_index.sql: MULTI_TENANT base, view with PK-extension
    columns, CREATE INDEX on the VIEW (DESC key + INCLUDE), then the
    catalog query from query_view_index.sql."""
    _run(engine, "add_view_index")
    res = _run(engine, "query_view_index")
    rows = res[0].collect()
    assert len(rows) == 1  # one header row for the view index
    assert rows[0][0] == 1  # VIEW_INDEX_ID assigned


def test_index_rebuild_async_and_system_task(engine):
    """index_rebuild_async.sql: index DISABLE (no maintenance), REBUILD
    ALL ASYNC (recorded in SYSTEM.TASK), post-rebuild correctness."""
    _run(engine, "index_rebuild_async")
    res = _run(engine, "query_index_rebuild_async")
    tasks = res[0].collect()
    assert len(tasks) == 1
    assert (tasks[0][0], tasks[0][1], tasks[0][2]) == (2, "TI", "COMPLETED")
    rows = {(r.k, r.v) for r in res[1].collect()}
    assert rows == {("key1", "val2"), ("key3", "val3")}
    # and the rebuilt index serves the current state (key4 deleted)
    ix = {(r.k, r.v) for r in engine.table("r_asyncind_ti").collect()}
    assert ix == rows


def test_tmp_table_select_and_drop(engine):
    _run(engine, "create_tmp_table")
    # collect each result eagerly: the script's last statement DROPs the
    # table the earlier SELECTs read (JDBC executes statements eagerly)
    res = [
        r.collect() if hasattr(r, "collect") else r
        for stmt in _statements(f"{SQL_DIR}/query_select_and_drop_table.sql")
        for r in [engine.sql(stmt)]
    ]
    assert res[0][0][0] == 1
    assert [(r.id, r.name) for r in res[1]] == [("a", "a_name")]
    with pytest.raises(ValueError):
        engine.managed("my_schema.my_table_delete2")


def test_system_catalog_columns(engine):
    """SYSTEM.CATALOG row layout: header rows carry COLUMN_COUNT, column
    rows carry DATA_TYPE/ORDINAL_POSITION/KEY_SEQ
    (PhoenixDatabaseMetaData)."""
    engine.sql(
        "CREATE TABLE s1.t1 (k BIGINT NOT NULL, v VARCHAR, "
        "CONSTRAINT pk PRIMARY KEY (k))"
    )
    hdr = engine.sql(
        "SELECT TABLE_TYPE, COLUMN_COUNT, PK_NAME FROM SYSTEM.CATALOG "
        "WHERE TABLE_SCHEM = 'S1' AND TABLE_NAME = 'T1' "
        "AND COLUMN_COUNT IS NOT NULL"
    ).collect()
    assert [(r[0], r[1], r[2]) for r in hdr] == [("u", 2, "PK")]
    cols = engine.sql(
        "SELECT COLUMN_NAME, DATA_TYPE, ORDINAL_POSITION, KEY_SEQ "
        "FROM SYSTEM.CATALOG WHERE TABLE_SCHEM = 'S1' "
        "AND TABLE_NAME = 'T1' AND COLUMN_NAME IS NOT NULL "
        "ORDER BY ORDINAL_POSITION"
    ).collect()
    assert [tuple(r) for r in cols] == [("K", -5, 1, 1), ("V", 12, 2, None)]


def test_system_sequence(engine):
    engine.sql("CREATE SEQUENCE s1.seq START WITH 5 INCREMENT BY 2 CACHE 10")
    row = engine.sql(
        "SELECT SEQUENCE_SCHEMA, SEQUENCE_NAME, CURRENT_VALUE, INCREMENT_BY "
        "FROM SYSTEM.SEQUENCE"
    ).collect()[0]
    assert tuple(row) == ("S1", "SEQ", 5, 2)


def test_qualified_names_everywhere(engine):
    """schema.table resolves in every SELECT position: FROM, JOIN, and
    3-part column references."""
    engine.sql(
        "CREATE TABLE sq.a (k BIGINT NOT NULL, v VARCHAR, "
        "CONSTRAINT pk PRIMARY KEY (k))"
    )
    engine.sql(
        "CREATE TABLE sq.b (k BIGINT NOT NULL, w VARCHAR, "
        "CONSTRAINT pk PRIMARY KEY (k))"
    )
    engine.sql("UPSERT INTO sq.a VALUES (1, 'x')")
    engine.sql("UPSERT INTO sq.b VALUES (1, 'y')")
    rows = engine.sql(
        "SELECT sq.a.v, sq.b.w FROM sq.a JOIN sq.b ON sq.a.k = sq.b.k"
    ).collect()
    assert [(r[0], r[1]) for r in rows] == [("x", "y")]


def test_query_create_add_alone(engine):
    """query_create_add.sql after create_add.sql only (the upgrade harness's
    pre-add check): base rows a,b plus c written through the view with its
    name constant auto-filled."""
    _run(engine, "create_add")
    res = _run(engine, "query_create_add")
    assert res[0].collect()[0][0] == 3  # a, b, c
    assert {(r[0], r[1]) for r in res[1].collect()} == {
        ("a", "a_name"),
        ("b", "b_name"),
        ("c", "a_name"),  # view constant auto-filled
    }
    assert {r[0] for r in res[2].collect()} == {"a", "c"}
    assert res[3].collect()[0][0] == 2  # immutable: a, b
    assert {(r[0], r[1]) for r in res[4].collect()} == {
        ("a", "a_name"),
        ("b", "b_name"),
    }


def test_query_delete_and_drop_cycle(engine):
    """query_delete.sql, query_delete_for_splitable_syscat.sql (create →
    upsert → select → DROP over a SALT_BUCKETS table), and
    query_select_and_drop_table.sql, which selects-then-drops a table an
    EARLIER harness phase created (replayed here with the same template
    statement the harness uses, renamed to my_table_delete2)."""
    res = _run(engine, "query_delete")
    assert res[2].collect()[0][0] == 1  # COUNT(*) after the single upsert
    assert res[3].collect()[0] == ("a", "a_name")

    # these scripts DROP the table they select from, so collect each SELECT
    # eagerly before the next statement runs
    import pytest as _pt

    def _run_eager(fname):
        out = []
        for stmt in _statements(f"{SQL_DIR}/{fname}.sql"):
            r = engine.sql(stmt)
            out.append(r.collect() if hasattr(r, "collect") else r)
        return out

    res = _run_eager("query_delete_for_splitable_syscat")
    assert res[2][0][0] == 1  # one row before the drop
    with _pt.raises(ValueError):  # the script ends with DROP TABLE
        engine.managed("my_schema.my_table_delete5")

    engine.sql(
        "CREATE TABLE if not exists my_schema.my_table_delete2 "
        "(id VARCHAR not null primary key, name VARCHAR) SALT_BUCKETS=4"
    )
    engine.sql("UPSERT INTO my_schema.my_table_delete2 values ('a','a_name')")
    res = _run_eager("query_select_and_drop_table")
    assert res[0][0][0] == 1  # one row before the drop
    with _pt.raises(ValueError):
        engine.managed("my_schema.my_table_delete2")
