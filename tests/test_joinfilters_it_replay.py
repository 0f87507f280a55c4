"""WhereOptimizerForJoinFiltersIT replay (end2end/join/
WhereOptimizerForJoinFiltersIT.java) — a 6-key equi-self-join over a
7-column composite PK with IN/equality filters on BOTH sides and on one
side only (the reference pins that key-range intersection across join
filters doesn't drop rows)."""

from __future__ import annotations

import pytest

from tests.conftest import SF_TEST_DIR

VALUES = [
    ("201904", "ID2_VAL", "ID3_VAL", "01", "000000", "ID4_VAL", "ID5_VAL",
     "2019-05-30 22:41:37.000"),
    ("201905", "ID2_VAL", "ID3_VAL", "01", "000000", "ID4_VAL", "ID5_VAL",
     "2019-12-31 22:59:59.000"),
    ("201905", "ID2_VAL", "ID3_VAL", "30", "000000", "ID4_VAL", "ID5_VAL",
     "2019-12-31 22:59:59.000"),
    ("201904", "ID2_VAL", "ID3_VAL2", "01", "000000", "ID4_VAL", "ID5_VAL",
     "2019-05-30 22:41:37.000"),
    ("201905", "ID2_VAL", "ID3_VAL2", "30", "000000", "ID4_VAL", "ID5_VAL",
     "2019-12-31 22:59:59.000"),
]


@pytest.fixture()
def engine(spark, tmp_path):
    from phoenix_spark.engine import Engine

    e = Engine(spark, sf_dir=SF_TEST_DIR, warehouse=str(tmp_path / "wh"))
    for name in ("jf_left", "jf_right"):
        e.sql(
            f"CREATE TABLE {name} (id1 CHAR(6) NOT NULL, "
            "id2 VARCHAR(22) NOT NULL, id3 VARCHAR(12) NOT NULL, "
            "id4 CHAR(2) NOT NULL, id5 CHAR(6) NOT NULL, "
            "id6 VARCHAR(200) NOT NULL, id7 VARCHAR(50) NOT NULL, "
            "ts TIMESTAMP, CONSTRAINT PK_JOIN_AND_INTERSECTION_TABLE "
            "PRIMARY KEY(id1, id2, id3, id4, id5, id6, id7))"
        )
        for v in VALUES:
            e.sql(
                f"UPSERT INTO {name} (id1,id2,id3,id4,id5,id6,id7,ts) VALUES "
                f"('{v[0]}','{v[1]}','{v[2]}','{v[3]}','{v[4]}','{v[5]}',"
                f"'{v[6]}',TIMESTAMP '{v[7][:-4]}')"
            )
    return e


def test_join_filters_both_sides_and_one_side(engine):
    assert engine.sql("select count(*) AS c from jf_left").collect()[0][0] == 5
    got = engine.sql(
        "SELECT m.id1, r.id1 FROM jf_left m join jf_right r "
        "on m.id3 = r.id3 and m.id2 = r.id2 and m.id4 = r.id4 "
        "and m.id5 = r.id5 and m.id1 = r.id1 and m.ts = r.ts "
        "where m.id1 IN ('201904','201905') and r.id1 IN ('201904','201905') "
        "and r.id2 = 'ID2_VAL' and m.id2 = 'ID2_VAL' "
        "and m.id3 IN ('ID3_VAL','ID3_VAL2') "
        "and r.id3 IN ('ID3_VAL','ID3_VAL2') LIMIT 1000000000"
    ).collect()
    assert len(got) == 5
    got = engine.sql(
        "SELECT m.id1, r.id1 FROM jf_left m join jf_right r "
        "on m.id3 = r.id3 and m.id2 = r.id2 and m.id4 = r.id4 "
        "and m.id5 = r.id5 and m.id1 = r.id1 and m.ts = r.ts "
        "where r.id1 IN ('201904','201905') and r.id2 = 'ID2_VAL' "
        "and r.id3 IN ('ID3_VAL','ID3_VAL2') LIMIT 1000000000"
    ).collect()
    assert len(got) == 5
