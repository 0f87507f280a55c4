"""OnDuplicateKeyIT replay: the reference's atomic-upsert scenarios run
verbatim through Engine.sql (phoenix-core/src/it/.../OnDuplicateKeyIT.java;
statements copied with only table names changed).  Pins the semantics the
round-6 work touches: update expressions evaluate over the PRE-update row
(all assignments see the existing values, not each other's results), ||
chains and CASE inside dup-update expressions run through the catalog-typed
dialect rewrites, IGNORE inserts only absent PKs, and a later plain UPSERT
overrides accumulated dup-updates."""

from __future__ import annotations

import pytest

from tests.conftest import SF_TEST_DIR


@pytest.fixture()
def engine(spark, tmp_path):
    from phoenix_spark.engine import Engine

    return Engine(spark, sf_dir=SF_TEST_DIR, warehouse=str(tmp_path / "wh"))


def _row(engine, table):
    rows = engine.table(table).collect()
    assert len(rows) == 1
    return rows[0]


def test_new_and_update_on_single_numeric_column(engine):
    # OnDuplicateKeyIT.java:91-121
    engine.sql("create table t1 (pk varchar primary key, counter1 bigint, counter2 smallint)")
    dml = "UPSERT INTO t1 VALUES('a',0) ON DUPLICATE KEY UPDATE counter1 = counter1 + 1"
    engine.sql(dml)
    r = _row(engine, "t1")
    assert (r.pk, r.counter1) == ("a", 0)  # new row: VALUES win
    engine.sql(dml)
    r = _row(engine, "t1")
    assert (r.pk, r.counter1) == ("a", 1)  # existing row: expression wins


def test_new_and_update_on_single_varchar_column(engine):
    # OnDuplicateKeyIT.java:193-224 — || in the dup-update expression
    engine.sql("create table t2 (pk varchar primary key, counter1 varchar, counter2 smallint)")
    dml = "UPSERT INTO t2 VALUES('a','b') ON DUPLICATE KEY UPDATE counter1 = counter1 || 'b'"
    engine.sql(dml)
    assert _row(engine, "t2").counter1 == "b"
    engine.sql(dml)
    assert _row(engine, "t2").counter1 == "bb"


def test_update_with_case_and_default_column(engine):
    # OnDuplicateKeyIT.java:124-160 — CASE + || over a DEFAULT'd column
    # (the rand()/current_date() tail of the IT is nondeterministic and
    # skipped).  counter1 || CASE ... END || k2 || other2 || other1 types
    # through the r6 rewriter: every operand is a catalog VARCHAR/CHAR or a
    # string-literal CASE branch.
    engine.sql(
        "create table t3 (k1 varchar, k2 varchar, counter1 varchar, "
        "counter2 date, other1 char(3), other2 varchar default 'f', "
        "constraint pk primary key (k1,k2))"
    )
    dml = (
        "UPSERT INTO t3 VALUES('a','b','c',null,'eee') "
        "ON DUPLICATE KEY UPDATE counter1 = counter1 || "
        "CASE WHEN LENGTH(counter1) < 10 THEN 'SMALL' ELSE 'LARGE' END "
        "|| k2 || other2 || other1"
    )
    engine.sql(dml)
    assert _row(engine, "t3").counter1 == "c"
    engine.sql(dml)
    assert _row(engine, "t3").counter1 == "cSMALLbfeee"
    engine.sql(dml)
    assert _row(engine, "t3").counter1 == "cSMALLbfeeeLARGEbfeee"


def test_ignore_on_single_column(engine):
    # OnDuplicateKeyIT.java:278-307
    engine.sql("create table t4 (pk varchar primary key, counter1 bigint, counter2 bigint)")
    engine.sql("UPSERT INTO t4 VALUES('a',10)")
    engine.sql("UPSERT INTO t4 VALUES('a',0) ON DUPLICATE KEY IGNORE")
    assert _row(engine, "t4").counter1 == 10


def test_initial_ignore_with_update(engine):
    # OnDuplicateKeyIT.java:310-334
    engine.sql("create table t5 (pk varchar primary key, counter1 bigint, counter2 bigint)")
    engine.sql("UPSERT INTO t5 VALUES('a',10) ON DUPLICATE KEY IGNORE")
    engine.sql("UPSERT INTO t5 VALUES('a',0) ON DUPLICATE KEY UPDATE counter1 = counter1 + 1")
    assert _row(engine, "t5").counter1 == 11


def test_override_on_dup_key_update_with_upsert(engine):
    # OnDuplicateKeyIT.java:336-362 — plain UPSERT overrides accumulated
    # dup-updates
    engine.sql("create table t6 (pk varchar primary key, counter1 bigint, counter2 bigint)")
    for v in (0, 1, 2):
        engine.sql(
            f"UPSERT INTO t6 VALUES('a',{v}) ON DUPLICATE KEY UPDATE counter1 = counter1 + 1"
        )
    engine.sql("UPSERT INTO t6 VALUES('a',10)")
    assert _row(engine, "t6").counter1 == 10


def test_new_and_multi_different_update_on_single_column(engine):
    # OnDuplicateKeyIT.java:422-449
    engine.sql("create table t7 (pk varchar primary key, counter1 bigint, counter2 decimal)")
    for delta in (1, 2, 1):
        engine.sql(
            f"UPSERT INTO t7 VALUES('a',0) ON DUPLICATE KEY UPDATE counter1 = counter1 + {delta}"
        )
    assert _row(engine, "t7").counter1 == 3  # insert 0, then +2, then +1


def test_complex_duplicate_key_expression(engine):
    # OnDuplicateKeyIT.java:783-820 — every assignment sees the PRE-update
    # row: approval's CASE reads the OLD counter1, not counter1+counter2
    engine.sql(
        "create table t8 (pk varchar primary key, counter1 bigint, "
        "counter2 bigint, approval varchar)"
    )
    engine.sql("UPSERT INTO t8 VALUES('abc', 0, 100, 'NONE')")
    dml = (
        "UPSERT INTO t8(pk, counter1, counter2) VALUES ('abc', 0, 10) "
        "ON DUPLICATE KEY UPDATE "
        "counter1 = counter1 + counter2,"
        "approval = CASE WHEN counter1 < 100 THEN 'NONE' "
        "WHEN counter1 < 1000 THEN 'MANAGER_APPROVAL' "
        "ELSE 'VP_APPROVAL' END"
    )
    engine.sql(dml)
    r = _row(engine, "t8")
    assert (r.counter1, r.counter2, r.approval) == (100, 100, "NONE")
    engine.sql(dml)
    r = _row(engine, "t8")
    assert (r.counter1, r.counter2, r.approval) == (200, 100, "MANAGER_APPROVAL")
