"""Array2IT replay (end2end/Array2IT.java, selected semantics) —
ARRAY_LENGTH, subscripts over LITERAL constructors (1-based), array
equality across different lengths and with NULL elements, array subscripts
in WHERE and GROUP BY, and NULL-array upserts."""

from __future__ import annotations

import pytest

from tests.conftest import SF_TEST_DIR


@pytest.fixture()
def engine(spark, tmp_path):
    from phoenix_spark.engine import Engine

    return Engine(spark, sf_dir=SF_TEST_DIR, warehouse=str(tmp_path / "wh"))


def one(engine, sql):
    rows = engine.sql(sql).collect()
    assert len(rows) == 1
    return rows[0][0]


def test_literal_array_subscript_and_length(engine):
    # Array2IT.java:358/:663 — 1-based subscript over a literal constructor
    assert one(engine, "SELECT ARRAY['a','b','c'][2] AS v") == "b"
    assert one(engine, "SELECT ARRAY_LENGTH(ARRAY[1,2,3]) AS v") == 3
    assert one(engine, "SELECT ARRAY[1, NULL, 3][2] AS v") is None
    assert one(engine, "SELECT ARRAY[1, NULL, 3][4] AS v") is None


def test_array_comparisons(engine):
    # Array2IT.java:429-530 — whole-array equality across sizes and NULLs
    assert one(engine, "SELECT (ARRAY[1,2] = ARRAY[1,2]) AS v") is True
    assert one(engine, "SELECT (ARRAY[1,2] = ARRAY[1,2,3]) AS v") is False
    assert one(engine, "SELECT (ARRAY[1,2] != ARRAY[1,2,3]) AS v") is True


def test_array_index_in_where_and_group_by(engine):
    # Array2IT.java:114/:143
    engine.sql(
        "create table arr2 (pk integer not null primary key, "
        "grp varchar array, score integer)"
    )
    engine.sql("upsert into arr2 values (1, ARRAY['a', 'x'], 10)")
    engine.sql("upsert into arr2 values (2, ARRAY['a', 'y'], 20)")
    engine.sql("upsert into arr2 values (3, ARRAY['b', 'x'], 30)")
    got = [
        r[0] for r in engine.sql(
            "SELECT pk FROM arr2 WHERE grp[1] = 'a' ORDER BY pk"
        ).collect()
    ]
    assert got == [1, 2]
    got = sorted(
        tuple(r) for r in engine.sql(
            "SELECT grp[1] AS g, sum(score) AS s FROM arr2 GROUP BY grp[1]"
        ).collect()
    )
    assert got == [("a", 30), ("b", 30)]


def test_upsert_null_array(engine):
    # Array2IT.java:532 — an explicit NULL array round-trips as NULL
    engine.sql(
        "create table arr2n (pk integer not null primary key, vals double array)"
    )
    engine.sql("upsert into arr2n values (1, null)")
    engine.sql("upsert into arr2n values (2, ARRAY[1.5])")
    got = {r[0]: r[1] for r in engine.sql("SELECT pk, vals FROM arr2n").collect()}
    assert got[1] is None and list(got[2]) == [1.5]
