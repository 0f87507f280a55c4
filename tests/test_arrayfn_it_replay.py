"""Array function IT replay: ArrayAppendFunctionIT, ArrayPrependFunctionIT,
ArrayConcatFunctionIT, ArrayRemoveFunctionIT, ArrayFillFunctionIT,
ArrayToStringFunctionIT, ArraysWithNullsIT (end2end/Array*FunctionIT.java).

The NULL contracts these ITs pin (ArrayModifierFunction and friends) differ
from Spark's builtins in every direction:
  * ARRAY_APPEND/ARRAY_PREPEND with a NULL element return the array
    UNCHANGED (Spark appends a NULL);
  * ARRAY_APPEND/ARRAY_PREPEND on a NULL array return a singleton of the
    element (Spark returns NULL);
  * ARRAY_CAT with one NULL side returns the other side, preserving
    interior NULL elements (Spark's concat returns NULL);
  * ARRAY_REMOVE of a NULL element is a no-op (Spark returns NULL);
  * ARRAY_FILL with a non-positive length raises
    (Spark's array_repeat returns an empty array).
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_TEST_DIR


@pytest.fixture(scope="module")
def spark():
    from phoenix_spark.session import get_spark

    return get_spark(
        app_name="phoenix_spark_tests", master="local[8]", shuffle_partitions=8
    )


@pytest.fixture(scope="module")
def engine(spark, tmp_path_factory):
    """ArrayAppendFunctionIT.initTables:34 fixture (shared by the
    Prepend/Concat/Remove/Fill/ToString suites with minor column deltas —
    the union schema carries all of them)."""
    from phoenix_spark.engine import Engine

    e = Engine(
        spark, sf_dir=SF_TEST_DIR,
        warehouse=str(tmp_path_factory.mktemp("arrfn_wh")),
    )
    e.sql(
        "CREATE TABLE regions (region_name VARCHAR NOT NULL, "
        "varchars VARCHAR[], integers INTEGER[], doubles DOUBLE[], "
        "bigints BIGINT[], chars CHAR(15)[], double1 DOUBLE, "
        "char1 CHAR(17), varchar1 VARCHAR, nullcheck INTEGER, "
        "chars2 CHAR(15)[], nullVarchar VARCHAR[], nullBigInt BIGINT[], "
        "CONSTRAINT pk PRIMARY KEY (region_name))"
    )
    e.sql(
        "UPSERT INTO regions (region_name,varchars,integers,doubles,bigints,"
        "chars,double1,char1,varchar1,nullcheck,chars2) VALUES('SF Bay Area',"
        "ARRAY['2345','46345','23234'],"
        "ARRAY[2345,46345,23234,456],"
        "ARRAY[23.45,46.345,23.234,45.6,5.78],"
        "ARRAY[12,34,56,78,910],"
        "ARRAY['a','bbbb','c','ddd','e'],"
        "23.45,'wert',', ',NULL,"
        "ARRAY['a','bbbb','c','ddd','e','foo'])"
    )
    return e


def one(engine, sql):
    rows = engine.sql(sql + " FROM regions WHERE region_name = 'SF Bay Area'").collect()
    assert len(rows) == 1
    return rows[0][0]


# --- ArrayAppendFunctionIT ----------------------------------------------------


def test_append_empty_array_modification(engine):
    # ArrayAppendFunctionIT.testEmptyArrayModification:71 — NULL array +
    # element yields a singleton
    assert one(engine, "SELECT ARRAY_APPEND(nullVarchar,'34567') AS v") == ["34567"]
    assert one(engine, "SELECT ARRAY_PREPEND('34567',nullVarchar) AS v") == ["34567"]
    assert one(engine, "SELECT ARRAY_APPEND(nullBigInt,123) AS v") == [123]
    assert one(engine, "SELECT ARRAY_PREPEND(123,nullBigInt) AS v") == [123]


def test_append_varchar(engine):
    # testArrayAppendFunctionVarchar:137
    assert one(engine, "SELECT ARRAY_APPEND(varchars,'34567') AS v") == [
        "2345", "46345", "23234", "34567",
    ]


def test_append_integer_and_double(engine):
    # testArrayAppendFunctionInteger / Double
    assert one(engine, "SELECT ARRAY_APPEND(integers,1234) AS v") == [
        2345, 46345, 23234, 456, 1234,
    ]
    assert one(engine, "SELECT ARRAY_APPEND(doubles,double1) AS v") == [
        23.45, 46.345, 23.234, 45.6, 5.78, 23.45,
    ]


def test_append_nested_functions(engine):
    # testArrayAppendFunctionWithNestedFunctions1:~
    assert one(engine, "SELECT ARRAY_APPEND(ARRAY[23,45],integers[1]) AS v") == [
        23, 45, 2345,
    ]


def test_append_null_element_is_noop(engine):
    # testArrayAppendFunctionVarcharWithNull:664 / WithNull:718
    assert one(engine, "SELECT ARRAY_APPEND(varchars,NULL) AS v") == [
        "2345", "46345", "23234",
    ]
    assert one(engine, "SELECT ARRAY_APPEND(doubles,NULL) AS v") == [
        23.45, 46.345, 23.234, 45.6, 5.78,
    ]
    assert one(engine, "SELECT ARRAY_APPEND(integers,nullcheck) AS v") == [
        2345, 46345, 23234, 456,
    ]


def test_append_via_upsert_select(engine):
    # testUpsertEmptyArrayModification:100 — fresh key so the shared
    # fixture row stays pristine
    engine.sql(
        "UPSERT INTO regions (region_name,nullVarchar) "
        "SELECT 'upsert_probe', ARRAY_APPEND(nullVarchar,'34567') "
        "FROM regions WHERE region_name = 'SF Bay Area'"
    )
    got = engine.sql(
        "SELECT nullVarchar FROM regions WHERE region_name = 'upsert_probe'"
    ).collect()
    assert [r[0] for r in got] == [["34567"]]


# --- ArrayPrependFunctionIT ---------------------------------------------------


def test_prepend_varchar_and_null_rules(engine):
    # ArrayPrependFunctionIT (mirror matrix of append)
    assert one(engine, "SELECT ARRAY_PREPEND('34567',varchars) AS v") == [
        "34567", "2345", "46345", "23234",
    ]
    assert one(engine, "SELECT ARRAY_PREPEND(NULL,varchars) AS v") == [
        "2345", "46345", "23234",
    ]
    assert one(engine, "SELECT ARRAY_PREPEND(nullcheck,integers) AS v") == [
        2345, 46345, 23234, 456,
    ]
    assert one(engine, "SELECT ARRAY_PREPEND(1234,integers) AS v") == [
        1234, 2345, 46345, 23234, 456,
    ]


# --- ArrayConcatFunctionIT ----------------------------------------------------


def test_concat_null_side_returns_other(engine):
    # ArrayConcatFunctionIT.testNullArrayConcat:73
    assert one(engine, "SELECT ARRAY_CAT(nullVarchar,varchars) AS v") == [
        "2345", "46345", "23234",
    ]
    assert one(engine, "SELECT ARRAY_CAT(varchars,nullVarchar) AS v") == [
        "2345", "46345", "23234",
    ]


def test_concat_integer(engine):
    # testArrayConcatFunctionInteger:97
    assert one(engine, "SELECT ARRAY_CAT(integers,integers) AS v") == [
        2345, 46345, 23234, 456, 2345, 46345, 23234, 456,
    ]


def test_concat_preserves_interior_nulls(engine):
    # testArrayConcatFunctionWithNulls3:628 (binds inlined as ARRAY literals)
    got = one(
        engine,
        "SELECT ARRAY_CAT(ARRAY['a','b','c',NULL], ARRAY[NULL,'a','b','c']) AS v",
    )
    assert got == ["a", "b", "c", None, None, "a", "b", "c"]


# --- ArrayRemoveFunctionIT ----------------------------------------------------


def test_remove_on_null_array_is_null(engine):
    # ArrayRemoveFunctionIT.testEmptyArrayModification:65
    assert one(engine, "SELECT ARRAY_REMOVE(nullVarchar,'34567') AS v") is None


def test_remove_values(engine):
    # testArrayRemoveFunctionVarchar:74 / Integer / FirstElement
    assert one(engine, "SELECT ARRAY_REMOVE(varchars,'23234') AS v") == ["2345", "46345"]
    assert one(engine, "SELECT ARRAY_REMOVE(integers,456) AS v") == [2345, 46345, 23234]
    assert one(engine, "SELECT ARRAY_REMOVE(varchars,'2345') AS v") == ["46345", "23234"]


def test_remove_null_element_is_noop(engine):
    # testArrayRemoveFunctionVarcharWithNull:288 / WithNull:322
    assert one(engine, "SELECT ARRAY_REMOVE(varchars,NULL) AS v") == [
        "2345", "46345", "23234",
    ]
    assert one(engine, "SELECT ARRAY_REMOVE(integers,nullcheck) AS v") == [
        2345, 46345, 23234, 456,
    ]


# --- ArrayFillFunctionIT ------------------------------------------------------


def test_fill_basic_and_nested(engine):
    # ArrayFillFunctionIT basic matrix + WithNestedFunctions1
    assert one(engine, "SELECT ARRAY_FILL('ab', 3) AS v") == ["ab", "ab", "ab"]
    assert one(engine, "SELECT ARRAY_FILL(double1, 2) AS v") == [23.45, 23.45]
    assert one(engine, "SELECT ARRAY_FILL(ARRAY_ELEM(ARRAY[23,45],1),3) AS v") == [
        23, 23, 23,
    ]


def test_fill_invalid_length_raises(engine):
    # testArrayFillFunctionInvalidLength1/2:212 — non-positive length errors
    with pytest.raises(Exception, match="length must be positive"):
        one(engine, "SELECT ARRAY_FILL('ab', 0) AS v")
    with pytest.raises(Exception, match="length must be positive"):
        one(engine, "SELECT ARRAY_FILL('ab', -3) AS v")


# --- ArrayToStringFunctionIT --------------------------------------------------


def test_array_to_string(engine):
    # testArrayToStringFunctionVarchar1/2/3:56 + Int + Double
    assert one(engine, "SELECT ARRAY_TO_STRING(varchars, ',', '*') AS v") == (
        "2345,46345,23234"
    )
    assert one(engine, "SELECT ARRAY_TO_STRING(varchars, ',') AS v") == (
        "2345,46345,23234"
    )
    assert one(engine, "SELECT ARRAY_TO_STRING(ARRAY['hello','hello'], ',') AS v") == (
        "hello,hello"
    )
    assert one(engine, "SELECT ARRAY_TO_STRING(bigints, varchar1) AS v") == (
        "12, 34, 56, 78, 910"
    )


# --- ArraysWithNullsIT --------------------------------------------------------


@pytest.mark.parametrize(
    "typ,lit,expect",
    [
        ("INTEGER", "ARRAY[NULL,3,NULL]", [None, 3, None]),
        ("VARCHAR", "ARRAY['10',NULL]", ["10", None]),
        ("BIGINT", "ARRAY[2,NULL,32335,4]", [2, None, 32335, 4]),
        ("DOUBLE", "ARRAY[1.2,NULL,34.567]", [1.2, None, 34.567]),
        ("BOOLEAN", "ARRAY[true,NULL,false]", [True, None, False]),
        ("SMALLINT", "ARRAY[NULL,3]", [None, 3]),
        ("TINYINT", "ARRAY[2,NULL]", [2, None]),
    ],
)
def test_array_upsert_with_nulls(spark, tmp_path_factory, typ, lit, expect):
    # ArraysWithNullsIT.testArrayUpsert*WithNulls:30-194 — arrays holding
    # NULL elements round-trip through UPSERT VALUES per element type
    from phoenix_spark.engine import Engine

    e = Engine(
        spark, sf_dir=SF_TEST_DIR,
        warehouse=str(tmp_path_factory.mktemp(f"awn_{typ.lower()}")),
    )
    e.sql(f"CREATE TABLE t_awn (k VARCHAR NOT NULL, a {typ}[], "
          "CONSTRAINT pk PRIMARY KEY (k))")
    e.sql(f"UPSERT INTO t_awn VALUES('a',{lit})")
    got = e.sql("SELECT a FROM t_awn WHERE k = 'a'").collect()
    assert [r.a for r in got] == [expect]


@pytest.mark.parametrize(
    "typ,lit,expect_sql",
    [
        # ArraysWithNullsIT.testArrayUpsertDateWithNulls1/2:195-232 /
        # TimeStampWithNulls:271 / CharWithNulls:312 — temporal and CHAR
        # arrays round-trip NULL elements too
        ("DATE", "ARRAY[NULL, TO_DATE('2024-06-01 10:00:00'), NULL]",
         [None, "2024-06-01 10:00:00"]),
        ("TIMESTAMP", "ARRAY[TO_DATE('2024-06-01 10:00:00'), NULL]",
         ["2024-06-01 10:00:00", None]),
        ("CHAR(15)", "ARRAY['foo', NULL, 'fo', 'foo']",
         ["foo", None, "fo", "foo"]),
    ],
)
def test_array_upsert_with_nulls_temporal_char(spark, tmp_path_factory, typ,
                                               lit, expect_sql):
    from phoenix_spark.engine import Engine

    e = Engine(
        spark, sf_dir=SF_TEST_DIR,
        warehouse=str(tmp_path_factory.mktemp("awn_t")),
    )
    e.sql(f"CREATE TABLE t_awn2 (k VARCHAR NOT NULL, a {typ}[], "
          "CONSTRAINT pk PRIMARY KEY (k))")
    e.sql(f"UPSERT INTO t_awn2 VALUES('a',{lit})")
    got = e.sql("SELECT a FROM t_awn2 WHERE k = 'a'").collect()[0].a
    norm = [
        (v.strftime("%Y-%m-%d %H:%M:%S") if hasattr(v, "strftime")
         else (v.rstrip() if isinstance(v, str) else v))
        if v is not None else None
        for v in got
    ]
    want = [w for w in expect_sql]
    if typ == "DATE":
        want = [None, "2024-06-01 10:00:00", None]
    assert norm == want
