"""IsNullIT + LikeExpressionIT replay (phoenix-core/src/it/.../IsNullIT.java,
LikeExpressionIT.java — statements verbatim, results per the ITs).

Pins: nullable primary-key columns (incl. NULL in a leading PK position and
IS NULL point scans against a DESC-sorted trailing PK), integral division
over NULL, LIKE three-valued logic in the projection (NULL operand →
NULL, not false), '%'/'%%'-everything patterns excluding NULLs, backslash
escapes of regex metacharacters, and _/% wildcards across newlines."""

from __future__ import annotations

import pytest

from tests.conftest import SF_TEST_DIR


@pytest.fixture()
def engine(spark, tmp_path):
    from phoenix_spark.engine import Engine

    return Engine(spark, sf_dir=SF_TEST_DIR, warehouse=str(tmp_path / "wh"))


def test_is_null_in_pk(engine):
    # IsNullIT.java:35-61 (IntIntKeyTest table; short VALUES list)
    engine.sql("create table intint (i integer not null primary key, j integer)")
    engine.sql("UPSERT INTO intint VALUES(4,2)")
    engine.sql("UPSERT INTO intint VALUES(6)")
    rows = engine.sql("SELECT i/j AS v FROM intint WHERE j IS NULL").collect()
    assert len(rows) == 1 and rows[0].v is None  # null division -> null
    rows = engine.sql("SELECT i/j AS v FROM intint WHERE j IS NOT NULL").collect()
    assert len(rows) == 1 and rows[0].v == 2  # 4/2 truncating


def test_is_null_with_last_pk_col_desc(engine):
    # IsNullIT.java:64-90
    engine.sql(
        "CREATE TABLE pknull (k1 VARCHAR NOT NULL, k2 VARCHAR, k3 VARCHAR, "
        "CONSTRAINT pk PRIMARY KEY (k1, k2, k3 DESC))"
    )
    for v in ("('a')", "('b')", "('b',null,'c')", "('ba', null, 'd')"):
        engine.sql(f"UPSERT INTO pknull VALUES {v}")
    rows = engine.sql(
        "SELECT k1,k2,k3 FROM pknull WHERE k1='b' AND k2 IS NULL "
        "ORDER BY k3 NULLS FIRST"
    ).collect()
    assert [(r.k1, r.k2, r.k3) for r in rows] == [("b", None, None), ("b", None, "c")]


def test_is_null_in_composite_key(engine):
    # IsNullIT.java:92-113 — NULL in the LEADING PK position
    engine.sql(
        "CREATE TABLE ck (k1 VARCHAR, k2 VARCHAR, CONSTRAINT pk PRIMARY KEY (k1,k2))"
    )
    engine.sql("UPSERT INTO ck VALUES (null,'a')")
    engine.sql("UPSERT INTO ck VALUES ('a','a')")
    assert engine.sql("SELECT count(*) AS c FROM ck").collect()[0].c == 2
    assert (
        engine.sql(
            "SELECT count(*) AS c FROM ck WHERE k1 = 'a' or k1 is null"
        ).collect()[0].c
        == 2
    )


def test_like_everything_expression(engine):
    # LikeExpressionIT.java:94-150 — LIKE '%' / '%%' exclude NULL operands
    engine.sql(
        "CREATE TABLE lev (k1 VARCHAR, k2 VARCHAR, CONSTRAINT pk PRIMARY KEY (k1,k2))"
    )
    for v in ("('aa','bb')", "('ab','bc')", "(null,'cc')", "('dd',null)"):
        engine.sql(f"UPSERT INTO lev VALUES {v}")
    got = {
        (r.k1, r.k2)
        for r in engine.sql("SELECT * FROM lev WHERE k1 LIKE '%'").collect()
    }
    assert got == {("aa", "bb"), ("ab", "bc"), ("dd", None)}
    for pat in ("'%'", "'%%'"):
        got = {
            (r.k1, r.k2)
            for r in engine.sql(f"SELECT * FROM lev WHERE k2 LIKE {pat}").collect()
        }
        assert got == {(None, "cc"), ("aa", "bb"), ("ab", "bc")}
        assert engine.sql(f"SELECT * FROM lev WHERE k2 NOT LIKE {pat}").collect() == []


def test_like_with_escaped_lparen(engine):
    # LikeExpressionIT.java:153-172 — backslash-escaped regex metachar
    engine.sql("CREATE TABLE lp (k VARCHAR, v VARCHAR, CONSTRAINT pk PRIMARY KEY (k))")
    engine.sql("UPSERT INTO lp VALUES('aa','bb')")
    engine.sql(r"UPSERT INTO lp VALUES('a\(d','xx')")
    engine.sql("UPSERT INTO lp VALUES('dd',null)")
    rows = engine.sql(r"SELECT * FROM lp WHERE k not like '%\(%' ORDER BY k").collect()
    assert [(r.k, r.v) for r in rows] == [("aa", "bb"), ("dd", None)]


def test_like_newline_and_one_char(engine):
    # LikeExpressionIT.java:175-220 — % and _ match across newlines
    engine.sql("CREATE TABLE nl (k VARCHAR NOT NULL PRIMARY KEY)")
    engine.sql("UPSERT INTO nl VALUES('AA\nA')")
    for pat, n in (("'AA%'", 1), ("'AA_A'", 1), ("'AA%A'", 1), ("'AA_'", 0)):
        assert len(engine.sql(f"SELECT * FROM nl WHERE k like {pat}").collect()) == n, pat
    engine.sql("CREATE TABLE oc (k VARCHAR NOT NULL PRIMARY KEY)")
    engine.sql("UPSERT INTO oc VALUES('A')")
    engine.sql("UPSERT INTO oc VALUES('AA')")
    assert [r.k for r in engine.sql("SELECT * FROM oc WHERE k like '_'").collect()] == ["A"]
    assert [r.k for r in engine.sql("SELECT * FROM oc WHERE k like '_A'").collect()] == ["AA"]


def test_like_null_three_valued_projection(engine):
    # LikeExpressionIT.java:222-285 — LIKE over NULL in the SELECT list is
    # NULL (three-valued), for LIKE, NOT LIKE, and NOT(... LIKE ...)
    engine.sql("CREATE TABLE l3 (pk INTEGER PRIMARY KEY, str VARCHAR)")
    engine.sql("UPSERT INTO l3 VALUES(0,'aa')")
    engine.sql("UPSERT INTO l3 VALUES(1, null)")
    for expr, nonnull in (
        ("str LIKE '%'", True),
        ("str LIKE '%%'", True),
        ("str NOT LIKE '%'", False),
        ("str NOT LIKE '%%'", False),
        ("NOT (str LIKE '%')", False),
        ("NOT(str LIKE '%%')", False),
    ):
        rows = engine.sql(f"SELECT {expr} AS v FROM l3 ORDER BY pk").collect()
        assert rows[0].v is nonnull and rows[1].v is None, expr
