"""Array1IT replay (end2end/Array1IT.java) — 1-based array subscripts
(out-of-range → NULL, never an error), ARRAY_ELEM, array literals in
UPSERT VALUES and in WHERE equality, ANY/ALL quantified comparisons over
ARRAY COLUMNS (ArrayAnyComparisonExpression — exists()/forall() lambdas,
distinct from the subquery form), CASE yielding an array then subscripted,
and UPSERT SELECT carrying arrays.

Fixtures from ArrayIT.createTableWithArray/initTablesWithArrays and
Array1IT.createSimpleTableWithArray (values verbatim)."""

from __future__ import annotations

import pytest

from tests.conftest import SF_TEST_DIR

TENANT = "00D300000000XHP"
ROW1 = "00A123122312312"
B_VALUE = "b"


@pytest.fixture(scope="module")
def engine(tmp_path_factory):
    from phoenix_spark.engine import Engine
    from phoenix_spark.session import get_spark

    spark = get_spark(
        app_name="phoenix_spark_tests", master="local[8]", shuffle_partitions=8
    )
    e = Engine(
        spark, sf_dir=SF_TEST_DIR,
        warehouse=str(tmp_path_factory.mktemp("arr_wh")),
    )
    # ArrayIT.createTableWithArray + initTablesWithArrays (one ROW1 row)
    e.sql(
        "create table arrt (organization_id char(15) not null, "
        "entity_id char(15) not null, a_string_array varchar(100) array[3], "
        "b_string varchar(100), a_integer integer, a_date date, "
        "x_decimal decimal(31,10), x_long_array bigint[5], "
        "x_integer integer, a_byte_array tinyint array, a_short smallint, "
        "a_float float, a_double_array double array[], "
        "constraint pk primary key (organization_id, entity_id))"
    )
    e.sql(
        f"upsert into arrt (organization_id, entity_id, a_string_array, "
        "b_string, a_integer, x_long_array, a_byte_array, a_short, a_float, "
        f"a_double_array) values ('{TENANT}', '{ROW1}', "
        "ARRAY['ABC', 'CEDF', 'XYZWER', 'AB'], "
        f"'{B_VALUE}', 1, ARRAY[25, 36], ARRAY[25, 36], 128, "
        "CAST(0.01 AS FLOAT), ARRAY[25.343, 36.763, 37.56, 386.63])"
    )
    # Array1IT.createSimpleTableWithArray + initSimpleArrayTable
    e.sql(
        "create table arrs (organization_id char(15) not null, "
        "entity_id char(15) not null, x_double double, "
        "a_double_array double array[], a_char_array char(5) array[], "
        "constraint pk primary key (organization_id, entity_id))"
    )
    e.sql(
        f"upsert into arrs (organization_id, entity_id, x_double, "
        f"a_double_array, a_char_array) values ('{TENANT}', '{ROW1}', 1.2, "
        "ARRAY[64.87, 89.96], ARRAY['a', 'b'])"
    )
    return e


def rows(engine, sql):
    return [tuple(r) for r in engine.sql(sql).collect()]


def test_scan_with_array_in_where_clause(engine):
    # Array1IT.java:149/:188 — array-literal equality over fixed and
    # var-width element types
    for pred in (
        "ARRAY[25, 36] = a_byte_array",
        "ARRAY['ABC', 'CEDF', 'XYZWER', 'AB'] = a_string_array",
    ):
        got = rows(engine, (
            "SELECT a_double_array, b_string, a_float FROM arrt "
            f"WHERE '{TENANT}' = organization_id AND {pred}"
        ))
        assert len(got) == 1
        arr, b, fl = got[0]
        assert list(arr) == [25.343, 36.763, 37.56, 386.63]
        assert b == B_VALUE and abs(fl - 0.01) < 1e-6


def test_array_in_select_clause(engine):
    # Array1IT.java:228
    got = rows(engine, "SELECT a_string_array FROM arrt")
    assert [list(got[0][0])] == [["ABC", "CEDF", "XYZWER", "AB"]]


def test_specific_index_and_array_elem(engine):
    # Array1IT.java:255/:279 — 1-based: ARRAY_ELEM(x, 2) is the SECOND
    # element, x[3] the THIRD
    assert rows(engine, "SELECT ARRAY_ELEM(a_double_array, 2) FROM arrt") == [
        (36.763,)
    ]
    assert rows(engine, "SELECT a_double_array[3] FROM arrt") == [(37.56,)]
    # out-of-range subscript is NULL, not an error
    assert rows(engine, "SELECT a_double_array[99] FROM arrt") == [(None,)]


def test_case_with_array_subscript(engine):
    # Array1IT.java:302 — subscript over a CASE result
    got = rows(engine, (
        "SELECT CASE WHEN a_integer = 1 THEN a_double_array ELSE null END [3] "
        "FROM arrt"
    ))
    assert got == [(37.56,)]


def test_upsert_values_with_array(engine):
    # Array1IT.java:326
    engine.sql(
        f"upsert into arrt (organization_id, entity_id, a_double_array) "
        f"values ('{TENANT}', '00A123122312999', ARRAY[2.0, 345.8])"
    )
    got = rows(engine, (
        "SELECT a_double_array FROM arrt "
        "WHERE entity_id = '00A123122312999'"
    ))
    assert list(got[0][0]) == [2.0, 345.8]


def test_upsert_select_with_array(engine):
    # Array1IT.java:362 — UPSERT SELECT carrying an array column, filtered
    # by a 1-based subscript
    engine.sql(
        "create table arr_copy (organization_id char(15) not null, "
        "entity_id char(15) not null, a_double_array double array[], "
        "constraint pk primary key (organization_id, entity_id))"
    )
    engine.sql(
        "upsert into arr_copy (organization_id, entity_id, a_double_array) "
        "SELECT organization_id, entity_id, a_double_array FROM arrs "
        "WHERE a_double_array[2] = 89.96"
    )
    assert rows(engine, "SELECT ARRAY_ELEM(a_double_array, 2) FROM arr_copy") == [
        (89.96,)
    ]


def test_array_select_with_or_condition(engine):
    # Array1IT.java:402 — [0] is out of range on a 1-based array → NULL →
    # that OR arm contributes nothing; [2] = 89.96 matches
    got = rows(engine, (
        "SELECT a_double_array[1] FROM arrs "
        "WHERE a_double_array[2] = 89.96 OR a_char_array[0] = 'a'"
    ))
    assert got == [(64.87,)]


def test_array_any_all(engine):
    # Array1IT.java:429-529 — quantified comparisons over array COLUMNS
    assert rows(engine, (
        "SELECT a_double_array[1] FROM arrs "
        "WHERE CAST(89.96 AS DOUBLE) = ANY(a_double_array)"
    )) == [(64.87,)]
    assert rows(engine, (
        "SELECT a_double_array[1] FROM arrs "
        "WHERE CAST(64.87 AS DOUBLE) = ALL(a_double_array)"
    )) == []
    assert rows(engine, (
        "SELECT a_double_array[1] FROM arrs "
        "WHERE a_char_array[1] = 'f' OR CAST(89.96 AS DOUBLE) > ANY(a_double_array)"
    )) == [(64.87,)]
    assert rows(engine, (
        "SELECT a_double_array[1], a_double_array[2] FROM arrs "
        "WHERE a_char_array[1] = 'f' OR CAST(100.0 AS DOUBLE) > ALL(a_double_array)"
    )) == [(64.87, 89.96)]


def test_array_any_var_length(engine):
    # Array1IT.java:532
    for needle in ("XYZWER", "AB"):
        assert rows(engine, (
            "SELECT a_string_array[1] FROM arrt "
            f"WHERE '{needle}' = ANY(a_string_array)"
        )) == [("ABC",)]
    assert rows(engine, (
        "SELECT a_string_array[1] FROM arrt "
        "WHERE 'no-such' = ANY(a_string_array)"
    )) == []
