"""Array3IT replay (end2end/Array3IT.java) — the semantic subset: ARRAY[...]
constructors built from COLUMNS (per row), whole-array PK comparisons under
DESC storage (byte-inverted storage must not change comparison/ordering
semantics), and DESC-array ordering.  The ServerArrayElementProjection
matrix is an HBase server-side projection physicality; its observable
semantics (element projection + whole-array coexistence) are covered by the
Array1/2IT replays.
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
        warehouse=str(tmp_path_factory.mktemp("arr3_wh")),
    )


def test_array_constructor_from_columns(engine):
    # Array3IT.testArrayConstructorWithMultipleRows5:40 — ARRAY[a, b] built
    # from column values per row, then modified with ARRAY_APPEND
    engine.sql(
        "CREATE TABLE a3rows (region_name VARCHAR NOT NULL, a VARCHAR, "
        "b VARCHAR, CONSTRAINT pk PRIMARY KEY (region_name))"
    )
    engine.sql("UPSERT INTO a3rows (region_name, a, b) VALUES('a', 'foo', 'abc')")
    engine.sql("UPSERT INTO a3rows (region_name, a, b) VALUES('b', 'abc', 'dfg')")
    engine.sql("UPSERT INTO a3rows (region_name, a, b) VALUES('c', 'foo', 'abc')")
    got = [
        r[0]
        for r in engine.sql(
            "SELECT ARRAY_APPEND(ARRAY[a,b], 'oo') from a3rows "
            "ORDER BY region_name"
        ).collect()
    ]
    assert got == [
        ["foo", "abc", "oo"], ["abc", "dfg", "oo"], ["foo", "abc", "oo"],
    ]


def test_pk_with_desc_array_ordering(engine):
    # Array3IT.testPKWithDescArray:79 — arrays order lexicographically by
    # element; DESC storage must not change the logical order
    engine.sql(
        "CREATE TABLE a3desc (a VARCHAR ARRAY NOT NULL, "
        "CONSTRAINT pk PRIMARY KEY (a DESC))"
    )
    engine.sql("UPSERT INTO a3desc VALUES(ARRAY['a', 'ba'])")
    engine.sql("UPSERT INTO a3desc VALUES(ARRAY['a', 'c'])")
    got = [r.a for r in engine.sql(
        "SELECT a FROM a3desc ORDER BY a DESC"
    ).collect()]
    assert got == [["a", "c"], ["a", "ba"]]
    engine.sql("UPSERT INTO a3desc VALUES(ARRAY['a', 'b'])")
    got = [r.a for r in engine.sql(
        "SELECT a FROM a3desc ORDER BY a DESC"
    ).collect()]
    assert got == [["a", "c"], ["a", "ba"], ["a", "b"]]


@pytest.mark.parametrize(
    "stored,op,probe,match",
    [
        # Array3IT.testComparisonOperatorsForDesc1-8:132-324
        ("ARRAY['a', 'c']", ">=", "ARRAY['a', 'b']", True),
        ("ARRAY['a', 'c']", ">=", "ARRAY['a', 'c']", True),
        ("ARRAY['a', 'c']", ">", "ARRAY['a', 'b']", True),
        ("ARRAY['a', 'b']", "<=", "ARRAY['a', 'c']", True),
        ("ARRAY['a', 'b']", "<=", "ARRAY['a', 'b']", True),
        ("ARRAY['a', 'b']", "<", "ARRAY['a', 'c']", True),
        ("ARRAY[1, 2]", "<", "ARRAY[1, 4]", True),
        ("ARRAY[1, 2]", "<=", "ARRAY[1, 2]", True),
        # negative probes (implied complements)
        ("ARRAY['a', 'b']", ">", "ARRAY['a', 'b']", False),
        ("ARRAY[1, 2]", "<", "ARRAY[1, 2]", False),
    ],
)
def test_desc_array_comparisons(engine, stored, op, probe, match):
    import hashlib

    tag = hashlib.md5(f"{stored}{op}{probe}".encode()).hexdigest()[:8]
    typ = "VARCHAR" if "'" in stored else "INTEGER"
    engine.sql(
        f"CREATE TABLE a3c_{tag} (k {typ} ARRAY NOT NULL, "
        "CONSTRAINT pk PRIMARY KEY (k DESC))"
    )
    engine.sql(f"UPSERT INTO a3c_{tag} VALUES ({stored})")
    got = engine.sql(f"SELECT * from a3c_{tag} where k {op} {probe}").collect()
    assert (len(got) == 1) == match
