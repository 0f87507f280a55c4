"""StringIT replay (end2end/StringIT.java) — LPadFunction's edge contract
(empty fill → NULL, non-positive length → NULL, truncation, multi-char and
multi-byte fills), CHAR padding comparisons, and the NULL-skipping || chain
over a catalog with NULL columns (testStrConcat)."""

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


def test_lpad_matrix(engine):
    # StringIT.java:159-232 — the LPAD helper matrix, literals inlined
    cases = [
        ("LPAD('ABCD', 6)", "  ABCD"),              # default space fill
        ("LPAD('ണഫɰɸ', 6)", "  ണഫɰɸ"),              # multi-byte input
        ("LPAD('X', 4, '')", None),                  # empty fill → NULL
        ("LPAD('ABCD', 8, '123456')", "1234ABCD"),  # fill longer than pad
        ("LPAD('ണഫɰɸ', 8, 'ɚɚɦɚɚɦ')", "ɚɚɦɚണഫɰɸ"),
        ("LPAD('ABCD', 8, '12')", "1212ABCD"),      # fill repeats
        ("LPAD('ɰɸɰɸ', 8, 'ഫɰ')", "ഫɰഫɰɰɸɰɸ"),
        ("LPAD('ABCD', 8, '1234')", "1234ABCD"),    # fill == pad length
        ("LPAD('ABCD', 4, '1234')", "ABCD"),        # zero padding needed
        ("LPAD('ABCD', 2, '12')", "AB"),             # truncates
        ("LPAD('ണഫɰɸ', 2, 'ɚɦ')", "ണഫ"),
        # the truncation fast-path never evaluates the fill expression
        # (LpadFunction.evaluate returns before getFillExpr()), so an empty
        # or NULL fill still truncates
        ("LPAD('hello', 3, '')", "hel"),
        ("LPAD('hello', 3, NULL)", "hel"),
        ("LPAD('hello', 5, '')", "hello"),           # len == input len
        ("LPAD('hello', 6, NULL)", None),            # pad needed, NULL fill
        ("LPAD('ABCD', 0, '12')", None),             # zero length → NULL
        ("LPAD('ABCD', -1, '12')", None),            # negative → NULL
        ("LPAD(NULL, 4, '12')", None),               # NULL input
    ]
    for expr, want in cases:
        assert one(engine, f"SELECT {expr} AS v") == want, expr


def test_char_padding_roundtrip(engine):
    # StringIT.java:97 — CHAR(3) values store unpadded ('a', 'ab') and sort
    # naturally in both directions
    engine.sql("CREATE TABLE str_cp (k CHAR(3) PRIMARY KEY)")
    engine.sql("UPSERT INTO str_cp VALUES('a')")
    engine.sql("UPSERT INTO str_cp VALUES('ab')")
    got = [r.k for r in engine.sql("SELECT * FROM str_cp ORDER BY k").collect()]
    assert [v.rstrip() for v in got] == ["a", "ab"]
    got = [
        r.k for r in engine.sql("SELECT * FROM str_cp ORDER BY k DESC").collect()
    ]
    assert [v.rstrip() for v in got] == ["ab", "a"]


def test_str_concat_null_skip(engine):
    # StringIT.java:235 — F2/F4 are NULL; the || chain skips them
    engine.sql(
        "create table str_cc (PK1 integer, F1 varchar, F2 varchar, "
        "F3 varchar, F4 varchar, constraint PK primary key (PK1))"
    )
    engine.sql("upsert into str_cc (PK1, F1, F3) values(0, 'tortilla', 'chip')")
    got = engine.sql(
        "select * from str_cc where (F1||F2||F3||F4)='tortillachip'"
    ).collect()
    assert len(got) == 1 and got[0].pk1 == 0
