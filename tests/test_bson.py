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
