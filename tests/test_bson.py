"""Unit tests for the BSON condition-expression compiler (phoenix_spark/bson.py)
— the PhoenixBsonExpression.g grammar surface (Bson1IT-6IT analogue)."""

from __future__ import annotations

import pytest

from phoenix_spark.bson import BsonConditionError, bson_condition


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, '{"a": 5, "s": "hello", "nested": {"x": 1}, "arr": [1, 2]}'),
        (2, '{"a": 50, "s": "world"}'),
        (3, '{"s": "hexagon"}'),
        (4, '{"a": -3.5, "s": ""}'),
    ]
    return spark.createDataFrame(rows, "id: long, doc: string")


def ids(docs, cond):
    return sorted(r.id for r in docs.filter(bson_condition("doc", cond)).collect())


def test_attribute_exists(docs):
    assert ids(docs, "attribute_exists(a)") == [1, 2, 4]
    assert ids(docs, "attribute_not_exists(a)") == [3]
    assert ids(docs, "attribute_exists(nested.x)") == [1]


def test_comparisons_between_in(docs):
    assert ids(docs, "a > 4") == [1, 2]
    assert ids(docs, "a BETWEEN 0 AND 10") == [1]
    assert ids(docs, "a IN (5, 50)") == [1, 2]
    assert ids(docs, "s = 'world'") == [2]


def test_begins_with_contains_size(docs):
    assert ids(docs, "begins_with(s, 'he')") == [1, 3]
    assert ids(docs, "contains(s, 'orl')") == [2]
    assert ids(docs, "size(s) = 5") == [1, 2]


def test_field_type(docs):
    assert ids(docs, "field_type(a, 'N')") == [1, 2, 4]
    assert ids(docs, "field_type(s, 'S')") == [1, 2, 3, 4]  # "" is a string
    assert ids(docs, "field_type(arr, 'L')") == [1]
    assert ids(docs, "field_type(nested, 'M')") == [1]


def test_boolean_combinators(docs):
    assert ids(docs, "attribute_exists(a) AND NOT a > 10") == [1, 4]
    assert ids(docs, "(a > 10 OR begins_with(s, 'hex')) AND size(s) >= 5") == [2, 3]


def test_parse_errors():
    with pytest.raises(BsonConditionError):
        bson_condition("doc", "begins_with(")
    with pytest.raises(BsonConditionError):
        bson_condition("doc", "a ??? 5")


def test_update_expression_chains(spark):
    from phoenix_spark.bson import BsonUpdateError, bson_update_expression

    df = spark.createDataFrame(
        [('{"a": 1, "b": "x", "tags": ["p", "q"], "n": 5}',)], ["doc"]
    )

    def run(expr):
        return df.select(
            bson_update_expression("doc", expr).alias("u")
        ).collect()[0].u

    # reference order SET -> UNSET -> ADD -> DELETE_FROM_SET, chained per
    # field (UpdateExpressionUtils.updateExpression:104-118)
    assert run(
        '{"$SET": {"b": "y", "new": true}, "$UNSET": {"a": null},'
        ' "$ADD": {"n": 3, "tags": ["r"]},'
        ' "$DELETE_FROM_SET": {"tags": ["p"]}}'
    ) == '{"b":"y","n":8,"new":true,"tags":["q","r"]}'
    # $ADD on absent fields: number starts at 0, set starts empty
    assert run('{"$ADD": {"m": 2.5, "ms": ["z"]}}') == (
        '{"a":1,"b":"x","m":2.5,"ms":["z"],"n":5,"tags":["p","q"]}'
    )
    # static folds: SET then ADD then DELETE on one field
    assert run(
        '{"$SET": {"tags": ["a", "b"]}, "$ADD": {"tags": ["c"]},'
        ' "$DELETE_FROM_SET": {"tags": ["a"]}}'
    ) == '{"a":1,"b":"x","n":5,"tags":["b","c"]}'
    assert run('{"$SET": {"n": 10}, "$ADD": {"n": 0.5}}') == (
        '{"a":1,"b":"x","n":10.5,"tags":["p","q"]}'
    )
    assert run('{"$UNSET": {"n": null}, "$ADD": {"n": 7}}') == (
        '{"a":1,"b":"x","n":7,"tags":["p","q"]}'
    )

    import pytest as _pytest

    with _pytest.raises(BsonUpdateError):
        bson_update_expression("doc", '{"$RENAME": {"a": "b"}}')
    with _pytest.raises(BsonUpdateError):
        bson_update_expression("doc", '{"$ADD": {"a": "not-a-number"}}')
    # deep paths are SUPPORTED as of round 7 (Bson2IT/Bson3IT replays);
    # an unparseable path still raises
    with _pytest.raises(BsonUpdateError):
        bson_update_expression("doc", '{"$SET": {"a..b": 1}}')


def test_update_expression_type_safety(spark):
    """The refuse-to-mis-apply contract: $ADD/$DELETE_FROM_SET over wrong
    runtime types raise instead of silently coercing; DELETE on an absent
    field is a no-op (matches UpdateExpressionUtils' rejections)."""
    import pytest as _pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    from phoenix_spark.bson import BsonUpdateError, bson_update_expression

    df = spark.createDataFrame([('{"a": 1, "s": "str", "tags": ["p"]}',)], ["doc"])

    def run(expr):
        return df.select(
            bson_update_expression("doc", expr).alias("u")
        ).collect()[0].u

    # DELETE on absent field: no-op, NOT an empty set
    assert run('{"$DELETE_FROM_SET": {"ghost": ["x"]}}') == (
        '{"a":1,"s":"str","tags":["p"]}'
    )
    # runtime type mismatches raise (plan-level raise_error)
    with _pytest.raises((SparkRuntimeException, Py4JJavaError)):
        run('{"$DELETE_FROM_SET": {"a": ["x"]}}')  # number is not a set
    with _pytest.raises((SparkRuntimeException, Py4JJavaError)):
        run('{"$ADD": {"s": 1}}')  # string is not a number
    with _pytest.raises((SparkRuntimeException, Py4JJavaError)):
        run('{"$ADD": {"s": ["x"]}}')  # string is not a set
    # plan-time operand validation
    with _pytest.raises(BsonUpdateError):
        bson_update_expression("doc", '{"$DELETE_FROM_SET": {"tags": "ab"}}')
    with _pytest.raises(BsonUpdateError):
        bson_update_expression(
            "doc", '{"$ADD": {"x": 1}, "$DELETE_FROM_SET": {"x": ["y"]}}'
        )
