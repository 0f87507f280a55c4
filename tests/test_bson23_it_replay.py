"""Bson2IT / Bson3IT / Bson5IT replay (end2end/Bson2IT.java:47,
Bson3IT.java:107, Bson5IT.java:100) — the DEEP-PATH document update surface:
$SET / $UNSET / $ADD / $DELETE_FROM_SET over "a.b[2][1].c" paths, DynamoDB
{"$set": [...]} set literals, the in-place arithmetic SET form
({"$SET": {p: {"$ADD": [p, n]}}}), and deep-path conditions with
$-placeholders, all through the plain-SQL UPSERT ... ON DUPLICATE KEY
UPDATE COL = CASE WHEN BSON_CONDITION_EXPRESSION THEN
BSON_UPDATE_EXPRESSION ELSE COL END shape.

Adaptation: the reference's $binary base64 payloads are opaque scalar
values — strings stand in; the engine's BSON representation is JSON text
and set values canonicalize to sorted arrays."""

from __future__ import annotations

import json

import pytest

from tests.conftest import SF_TEST_DIR


@pytest.fixture()
def engine(spark, tmp_path):
    from phoenix_spark.engine import Engine

    return Engine(spark, sf_dir=SF_TEST_DIR, warehouse=str(tmp_path / "wh"))


def _q(s: str) -> str:
    return s.replace("'", "''")


# a condensed analogue of json/sample_01.json: nested maps, nested lists,
# sets, numbers — every path shape the Bson2IT update expression touches
DOC1 = {
    "Title": "Book 101",
    "Id": "101",
    "IdS": "101.01",
    "Id2": 101.01,
    "ISBN": "111-1111111111",
    "NestedList1": [
        -485.34,
        "1234abcd",
        [
            "xyz0123",
            {
                "ISBN": "111-1111111111",
                "Title": "Book 101",
                "TitleSet1": ["Book 1010 Title", "Book 1011 Title"],
                "TitleSet2": ["Book 1010 Title", "Book 1011 Title"],
            },
        ],
    ],
    "NestedList12": [1, 2, [["stored01"], ["abc"]]],
    "NestedMap1": {
        "Id": 101,
        "Title": "Book 101 Title",
        "ColorList": ["Red", "Green"],
        "NList1": ["NListVal01", 12.22],
        "NSet1": [123.45, 9586.7778, -124, -6830.5555, -48695],
        "NestedMap2": {
            "Id": 101,
            "InPublication": True,
            "NList": [12.22, "NListVal01", 100],
        },
    },
    "Pictures": ["123_rear.jpg", "xyz_front.jpg"],
    "PictureBinarySet": ["123_rear.jpg", "xyz_front.jpg", "xyz_front.jpg_no"],
}


def test_bson2_update_expressions(engine):
    # Bson2IT.testUpdateExpressions:47 — the full four-operator update over
    # deep paths in one statement
    engine.sql(
        "CREATE TABLE b2 (PK1 VARCHAR NOT NULL, PK2 VARCHAR NOT NULL, "
        "COL BSON CONSTRAINT pk PRIMARY KEY(PK1, PK2))"
    )
    engine.sql(
        f"UPSERT INTO b2 VALUES ('pk0001', 'pk0002', '{_q(json.dumps(DOC1))}')"
    )
    update = {
        "$SET": {
            "Title": "Cycle_1234_new",
            "Id": "12345",
            "NestedMap1.ColorList": ["Black", "White", "Silver"],
            "Id1": "ID_101",
            "NestedMap1.NList1[0]": {"$set": ["Updated_set_01", "Updated_set_02"]},
            "NestedList1[2][1].ISBN": "111-1111111122",
            "NestedMap1.NestedMap2.NewID": "12345",
            "NestedMap1.NestedMap2.NList[2]": None,
            "NestedMap1.NestedMap2.NList[0]": 12.22,
        },
        "$UNSET": {
            "IdS": None,
            "Id2": None,
            "NestedMap1.Title": None,
            "NestedMap1.NestedMap2.InPublication": None,
            "NestedList1[2][1].TitleSet1": None,
        },
        "$ADD": {
            "AddedId": 10,
            "NestedMap1.AddedId": 10,
            "NestedMap1.NestedMap2.Id": -12345,
            "NestedList12[2][0]": {"$set": ["xyz01234", "abc01234"]},
            "Pictures": {"$set": ["xyz5@_rear.jpg", "1235@_rear.jpg"]},
        },
        "$DELETE_FROM_SET": {
            "PictureBinarySet": {
                "$set": ["123_rear.jpg", "xyz_front.jpg_no", "xyz_front.jpg"]
            },
            "NestedMap1.NSet1": {"$set": [-6830.5555, -48695]},
            "NestedList1[2][1].TitleSet2": {
                "$set": ["Book 1011 Title", "Book 1010 Title"]
            },
        },
    }
    engine.sql(
        "UPSERT INTO b2 VALUES ('pk0001', 'pk0002', NULL) "
        "ON DUPLICATE KEY UPDATE "
        f"COL = BSON_UPDATE_EXPRESSION(COL, '{_q(json.dumps(update))}')"
    )
    got = json.loads(engine.table("b2").collect()[0].col)
    assert got["Title"] == "Cycle_1234_new" and got["Id"] == "12345"
    assert got["NestedMap1"]["ColorList"] == ["Black", "White", "Silver"]
    assert got["Id1"] == "ID_101"
    assert sorted(got["NestedMap1"]["NList1"][0]) == [
        "Updated_set_01", "Updated_set_02",
    ]
    assert got["NestedList1"][2][1]["ISBN"] == "111-1111111122"
    assert got["NestedMap1"]["NestedMap2"]["NewID"] == "12345"
    assert got["NestedMap1"]["NestedMap2"]["NList"][2] is None
    assert got["NestedMap1"]["NestedMap2"]["NList"][0] == 12.22
    for gone in ("IdS", "Id2"):
        assert gone not in got
    assert "Title" not in got["NestedMap1"]
    assert "InPublication" not in got["NestedMap1"]["NestedMap2"]
    assert "TitleSet1" not in got["NestedList1"][2][1]
    assert got["AddedId"] == 10
    assert got["NestedMap1"]["AddedId"] == 10
    assert got["NestedMap1"]["NestedMap2"]["Id"] == 101 - 12345
    assert sorted(got["NestedList12"][2][0]) == [
        "abc01234", "stored01", "xyz01234",
    ]
    assert sorted(got["Pictures"]) == sorted(
        ["123_rear.jpg", "xyz_front.jpg", "xyz5@_rear.jpg", "1235@_rear.jpg"]
    )
    assert got["PictureBinarySet"] == []
    assert got["NestedMap1"]["NSet1"] == sorted(
        [123.45, 9586.7778, -124], key=lambda v: json.dumps(v)
    ) or set(got["NestedMap1"]["NSet1"]) == {123.45, 9586.7778, -124}
    assert got["NestedList1"][2][1]["TitleSet2"] == []


DOC3 = {
    "press": "beat",
    "softly": "softly",
    "browserling": "orig",
    "track": [
        {
            "shot": [
                "s0", "s1",
                [
                    {
                        "city": {
                            "standard": ["a", "b", "c", "d", "e", "softly"],
                            "problem": [1.5, 2.5, 100.0],
                            "flame": "burn",
                        }
                    }
                ],
            ]
        }
    ],
}


def test_bson3_sql_conditions_update(engine):
    # Bson3IT.testBsonOpsWithSqlConditionsUpdateSuccess:107 — deep-path
    # conditions with $-placeholders gate a deep-path update
    engine.sql(
        "CREATE TABLE b3 (PK1 VARCHAR NOT NULL, C1 VARCHAR, COL BSON "
        "CONSTRAINT pk PRIMARY KEY(PK1))"
    )
    engine.sql(f"UPSERT INTO b3 VALUES ('pk0001', '0002', '{_q(json.dumps(DOC3))}')")

    cond_miss = json.dumps({
        "$EXPR": "press = $press AND track[0].shot[2][0].city.standard[50] = $softly",
        "$VAL": {"$press": "beat", "$softly": "softly"},
    })
    got = engine.sql(
        "SELECT * FROM b3 WHERE PK1 = 'pk0001' AND C1 = '0002' "
        f"AND NOT BSON_CONDITION_EXPRESSION(COL, '{_q(cond_miss)}')"
    ).collect()
    assert len(got) == 1 and got[0].pk1 == "pk0001"

    cond_hit = json.dumps({
        "$EXPR": "press = $press AND track[0].shot[2][0].city.standard[5] = $softly",
        "$VAL": {"$press": "beat", "$softly": "softly"},
    })
    got = engine.sql(
        "SELECT * FROM b3 WHERE PK1 = 'pk0001' AND C1 = '0002' "
        f"AND BSON_CONDITION_EXPRESSION(COL, '{_q(cond_hit)}')"
    ).collect()
    assert len(got) == 1

    update = json.dumps({
        "$SET": {
            "browserling": "bin_-505169340.54880095",
            "track[0].shot[2][0].city.standard[5]": "soft",
            "track[0].shot[2][0].city.problem[2]": {
                "$ADD": ["track[0].shot[2][0].city.problem[2]", 529.435]
            },
        },
        "$UNSET": {"track[0].shot[2][0].city.flame": None},
    })
    engine.sql(
        "UPSERT INTO b3 VALUES ('pk0001', '0003', NULL) "
        "ON DUPLICATE KEY UPDATE COL = CASE WHEN "
        f"BSON_CONDITION_EXPRESSION(COL, '{_q(cond_hit)}') "
        f"THEN BSON_UPDATE_EXPRESSION(COL, '{_q(update)}') ELSE COL END, "
        "C1 = '0003'"
    )
    row = engine.table("b3").collect()[0]
    assert row.c1 == "0003"
    got = json.loads(row.col)
    city = got["track"][0]["shot"][2][0]["city"]
    assert city["standard"][5] == "soft"
    assert city["problem"][2] == 100.0 + 529.435
    assert "flame" not in city
    assert got["browserling"] == "bin_-505169340.54880095"

    # Bson3IT.testBsonOpsWithSqlConditionsUpdateFailure:1057 — a false
    # condition leaves the document untouched
    engine.sql(
        "UPSERT INTO b3 VALUES ('pk0001', '0004', NULL) "
        "ON DUPLICATE KEY UPDATE COL = CASE WHEN "
        f"BSON_CONDITION_EXPRESSION(COL, '{_q(cond_miss)}') "
        "THEN BSON_UPDATE_EXPRESSION(COL, '{\"$SET\": {\"press\": \"x\"}}') "
        "ELSE COL END, C1 = '0004'"
    )
    row = engine.table("b3").collect()[0]
    assert row.c1 == "0004"
    assert json.loads(row.col)["press"] == "beat"


def test_invalid_update_path_raises(spark):
    """Missing path INTERMEDIATES raise the reference's invalid-path error for
    every op; a missing LEAF is created by $SET/$ADD and a no-op for
    $UNSET/$DELETE_FROM_SET (UpdateExpressionUtils.updateNestedField:363-426,
    updateDocumentAtLeafNode:528-560)."""
    import pyspark.sql.functions as F

    from phoenix_spark.bson import bson_update_expression

    def run(doc, expr):
        df = spark.createDataFrame([(doc,)], "doc string").coalesce(1)
        return df.select(
            bson_update_expression(F.col("doc"), expr).alias("r")
        ).collect()[0].r

    def raises(doc, expr):
        with pytest.raises(Exception, match="document path .* invalid"):
            run(doc, expr)

    # missing intermediate -> BsonUpdateInvalidArgumentException analog
    raises('{"a":1}', '{"$UNSET": {"b.c": null}}')
    raises('{"a":1}', '{"$SET": {"b.c": 5}}')
    raises('{"a":1}', '{"$ADD": {"b.c": 2}}')
    raises('{"a":1}', '{"$DELETE_FROM_SET": {"b.c": {"$set": [1]}}}')
    # intermediate present but wrong container type
    raises('{"a":5}', '{"$SET": {"a.c": 1}}')
    # missing leaf: SET creates, UNSET / DELETE_FROM_SET no-op
    assert json.loads(run('{"a":{"x":1}}', '{"$SET": {"a.c": 5}}')) == {
        "a": {"c": 5, "x": 1}
    }
    assert json.loads(run('{"a":{"x":1}}', '{"$UNSET": {"a.c": null}}')) == {
        "a": {"x": 1}
    }
    assert json.loads(
        run('{"a":{"x":1}}', '{"$DELETE_FROM_SET": {"a.c": {"$set": [1]}}}')
    ) == {"a": {"x": 1}}
