"""Bson6IT replay (end2end/Bson6IT.java:78) — BSON_VALUE over deep paths
with the 4-arg default form, filtering WHERE clauses on typed leaf
extraction, and a conditional deep-path update flipping the filtered set.

Adaptation: $binary payloads → strings (opaque scalars in the JSON-text
BSON representation); the condensed documents keep every path shape the
IT's expressions touch."""

from __future__ import annotations

import json

import pytest

from tests.conftest import SF_TEST_DIR


@pytest.fixture()
def engine(spark, tmp_path):
    from phoenix_spark.engine import Engine

    return Engine(spark, sf_dir=SF_TEST_DIR, warehouse=str(tmp_path / "wh"))


def _doc(longitude, clock, extra_so=True):
    d = {
        "rather": [
            0, 1, 2,
            {
                "outline": {
                    "clock": clock,
                    "halfway": {"so": [["a"], ["b"], ["x", "y", "z"]]},
                }
            },
        ],
        "new_samples": ["Sample01", "Sample02", "Sample03"],
    }
    if longitude is not None:
        d["result"] = [
            {}, {"location": {"coordinates": {"longitude": longitude}}},
        ]
    return json.dumps(d).replace("'", "''")


def test_bson_value_function(engine):
    engine.sql(
        "CREATE TABLE b6 (PK1 VARCHAR NOT NULL, C1 VARCHAR, COL BSON "
        "CONSTRAINT pk PRIMARY KEY(PK1))"
    )
    engine.sql(f"UPSERT INTO b6 VALUES ('pk0001', '0002', '{_doc(None, 'personal')}')")
    engine.sql(f"UPSERT INTO b6 VALUES ('pk1010', '1010', '{_doc(-97.7431, 'personal')}')")
    engine.sql(f"UPSERT INTO b6 VALUES ('pk1011', '1011', '{_doc(52.3736, 'personal')}')")

    assert engine.sql("SELECT count(*) AS c FROM b6").collect()[0][0] == 3

    # typed deep-path extraction in WHERE (Bson6IT.java:104)
    got = engine.sql(
        "SELECT PK1 FROM b6 WHERE BSON_VALUE(COL, "
        "'result[1].location.coordinates.longitude', 'DOUBLE') = 52.3736"
    ).collect()
    assert [r[0] for r in got] == ["pk1011"]

    # 4-arg default form: absent longitude (pk0001) matches via the default
    got = engine.sql(
        "SELECT PK1 FROM b6 WHERE BSON_VALUE(COL, "
        "'result[1].location.coordinates.longitude', 'DOUBLE', '345.89405') "
        "= 345.89405"
    ).collect()
    assert sorted(r[0] for r in got) == ["pk0001"]

    # conditional deep-path update flips pk1010 out of the filtered set
    # (Bson6IT.java:149-187)
    cond = json.dumps({
        "$EXPR": "field_not_exists(newrecord) AND "
                 "field_exists(rather[3].outline.halfway.so[2][2])",
        "$VAL": {},
    }).replace("'", "''")
    update = json.dumps({
        "$ADD": {"new_samples": {"$set": ["Sample10", "Sample12"]}},
        "$DELETE_FROM_SET": {"new_samples": {"$set": ["Sample02", "Sample03"]}},
        "$SET": {"rather[3].outline.clock": "personal2"},
        "$UNSET": {"rather[3].outline.halfway.so[2][2]": None},
    }).replace("'", "''")
    engine.sql(
        "UPSERT INTO b6 VALUES ('pk1010', NULL, NULL) "
        "ON DUPLICATE KEY UPDATE COL = CASE WHEN "
        f"BSON_CONDITION_EXPRESSION(COL, '{cond}') "
        f"THEN BSON_UPDATE_EXPRESSION(COL, '{update}') ELSE COL END"
    )
    got = engine.sql(
        "SELECT PK1 FROM b6 WHERE BSON_VALUE(COL, "
        "'rather[3].outline.clock', 'VARCHAR') = 'personal' ORDER BY PK1"
    ).collect()
    assert [r[0] for r in got] == ["pk0001", "pk1011"]

    # 4-arg default in the SELECT list (Bson6IT.java:189-206)
    got = engine.sql(
        "SELECT PK1, BSON_VALUE(COL, 'rather[3].outline.clock', 'VARCHAR', "
        "'personal') AS clk FROM b6 WHERE "
        "BSON_VALUE(COL, 'rather[3].outline.clock', 'VARCHAR', 'personal') "
        "!= 'personal'"
    ).collect()
    assert [(r[0], r[1]) for r in got] == [("pk1010", "personal2")]
    # the updated document: set union + delete + unset all landed
    doc = json.loads(
        engine.sql("SELECT COL FROM b6 WHERE PK1 = 'pk1010'").collect()[0][0]
    )
    assert sorted(doc["new_samples"]) == ["Sample01", "Sample10", "Sample12"]
    assert doc["rather"][3]["outline"]["halfway"]["so"][2] == ["x", "y"]
