"""SequenceBulkAllocationIT replay (end2end/SequenceBulkAllocationIT.java) —
the ``NEXT <n> VALUES FOR`` bulk-allocation matrix over the single-writer
sequence service: cache interactions (bulk discards the cached remainder
unless the allocation fits in it), min/max all-or-nothing limit checks,
CYCLE prohibition, same-statement expression collapsing, and the
malformed-<n> parse errors.

JDBC adaptation: ``SELECT NEXT n VALUES FOR seq`` with no FROM runs here as
a single-row UPSERT VALUES / _eval_literal draw (same allocation path); the
multi-expression-per-statement scenarios use the SELECT rewrite over a
one-row table, mirroring the IT's FROM SYSTEM."SEQUENCE" trick.
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


@pytest.fixture()
def engine(spark, tmp_path):
    from phoenix_spark.engine import Engine

    e = Engine(spark, sf_dir=SF_TEST_DIR, warehouse=str(tmp_path / "wh"))
    e.sql("CREATE TABLE one_row (k BIGINT NOT NULL, CONSTRAINT pk PRIMARY KEY (k))")
    e.sql("UPSERT INTO one_row VALUES (1)")
    return e


def nxt(engine, seq, n=None):
    form = f"NEXT {n} VALUES FOR {seq}" if n else f"NEXT VALUE FOR {seq}"
    return engine._eval_literal(form)


def test_parse_next_values_rejects_bad_n(engine):
    # SequenceBulkAllocationIT.testSequenceParseNextValuesWithNull:111 /
    # WithNonNumber:124 / WithNegativeNumber:137 / WithZeroAllocated:150
    engine.sql("CREATE SEQUENCE pbad START WITH 1 INCREMENT BY 1")
    for bad in ("NULL", "'89b'", "'-1'", "0"):
        with pytest.raises(ValueError, match="MUST_BE_CONSTANT"):
            engine.sql(f"SELECT NEXT {bad} VALUES FOR pbad AS v FROM one_row")
    with pytest.raises(ValueError, match="MUST_BE_CONSTANT"):
        engine._eval_literal("NEXT 0 VALUES FOR pbad")


def test_bulk_with_no_allocated_values(engine):
    # testNextValuesForSequenceWithNoAllocatedValues:163 — bulk 100 on a
    # fresh sequence: returns 1, CURRENT VALUE = 100 (block end), NEXT = 101
    engine.sql("CREATE SEQUENCE b0 START WITH 1 INCREMENT BY 1 CACHE 1")
    assert nxt(engine, "b0", 100) == 1
    assert engine.current_value("b0") == 100
    assert nxt(engine, "b0") == 101


def test_bulk_with_previously_allocated_values(engine):
    # testNextValuesForSequenceWithPreviouslyAllocatedValues:207 — CACHE 100
    # reserved 1-100 on the first NEXT VALUE; the bulk 1000 does NOT fit the
    # cached remainder, so it discards it and starts at the server value 101
    engine.sql("CREATE SEQUENCE bprev START WITH 1 INCREMENT BY 1 CACHE 100")
    assert nxt(engine, "bprev") == 1
    assert engine.current_value("bprev") == 1
    assert nxt(engine, "bprev") == 2
    assert nxt(engine, "bprev", 1000) == 101
    assert engine.current_value("bprev") == 1100
    assert nxt(engine, "bprev") == 1101


def test_bulk_with_upsert_and_select(engine):
    # testNextValuesForSequenceWithUpsert:265
    engine.sql("CREATE SEQUENCE bup START WITH 1 INCREMENT BY 1 CACHE 100")
    engine.sql("CREATE TABLE bup_t (id INTEGER NOT NULL PRIMARY KEY)")
    assert nxt(engine, "bup") == 1
    assert engine.current_value("bup") == 1
    assert nxt(engine, "bup") == 2
    engine.sql("UPSERT INTO bup_t (id) VALUES (NEXT 1000 VALUES FOR bup)")
    rows = engine.sql(
        "SELECT id, NEXT VALUE FOR bup AS n FROM bup_t"
    ).collect()
    # threw out the cache of 100, incremented by 1000
    assert [(r.id, r.n) for r in rows] == [(101, 1101)]


def test_bulk_with_increment_by(engine):
    # testNextValuesForSequenceWithIncrementBy:302
    engine.sql("CREATE SEQUENCE binc START WITH 1 INCREMENT BY 3 CACHE 100")
    assert nxt(engine, "binc") == 1
    assert engine.current_value("binc") == 1
    assert nxt(engine, "binc") == 4
    assert nxt(engine, "binc", 1000) == 301
    assert engine.current_value("binc") == 3298
    assert nxt(engine, "binc") == 3301


def test_bulk_with_negative_increment_by(engine):
    # testNextValuesForSequenceWithNegativeIncrementBy:324
    engine.sql("CREATE SEQUENCE bneg START WITH 2000 INCREMENT BY -1 CACHE 100")
    assert nxt(engine, "bneg") == 2000
    assert engine.current_value("bneg") == 2000
    assert nxt(engine, "bneg") == 1999
    assert nxt(engine, "bneg", 1000) == 1900
    assert engine.current_value("bneg") == 901
    assert nxt(engine, "bneg") == 900


def test_bulk_with_negative_increment_gt_one(engine):
    # testNextValuesForSequenceWithNegativeIncrementByGreaterThanOne:346
    engine.sql("CREATE SEQUENCE bneg5 START WITH 2000 INCREMENT BY -5 CACHE 100")
    assert nxt(engine, "bneg5") == 2000
    assert engine.current_value("bneg5") == 2000
    assert nxt(engine, "bneg5") == 1995
    assert nxt(engine, "bneg5", 100) == 1500
    assert engine.current_value("bneg5") == 1005
    assert nxt(engine, "bneg5") == 1000


def test_bulk_exceeds_max_value(engine):
    # testNextValuesForSequenceExceedsMaxValue:375 — all-or-nothing: the
    # failed allocation consumes nothing and the cache continues
    engine.sql(
        "CREATE SEQUENCE bmax START WITH 100 INCREMENT BY 1 "
        "MINVALUE 100 MAXVALUE 900 CACHE 100"
    )
    assert nxt(engine, "bmax") == 100
    assert engine.current_value("bmax") == 100
    assert nxt(engine, "bmax") == 101
    with pytest.raises(ValueError, match="MAXVALUE|exceeds"):
        nxt(engine, "bmax", 1000)
    assert engine.current_value("bmax") == 101
    assert nxt(engine, "bmax") == 102


def test_bulk_exceeds_min_value(engine):
    # testNextValuesForSequenceExceedsMinValue:411
    engine.sql(
        "CREATE SEQUENCE bmin START WITH 900 INCREMENT BY -5 "
        "MINVALUE 100 MAXVALUE 900 CACHE 100"
    )
    assert nxt(engine, "bmin") == 900
    assert engine.current_value("bmin") == 900
    assert nxt(engine, "bmin") == 895
    with pytest.raises(ValueError, match="MINVALUE|exceeds"):
        nxt(engine, "bmin", 160)
    assert engine.current_value("bmin") == 895
    assert nxt(engine, "bmin") == 890


def test_bulk_with_min_max_defined(engine):
    # testNextValuesForSequenceWithMinMaxDefined:445
    engine.sql(
        "CREATE SEQUENCE bmm START WITH 100 INCREMENT BY 5 "
        "MINVALUE 100 MAXVALUE 6000 CACHE 100"
    )
    assert nxt(engine, "bmm") == 100
    assert engine.current_value("bmm") == 100
    assert nxt(engine, "bmm") == 105
    assert nxt(engine, "bmm", 1000) == 600
    assert engine.current_value("bmm") == 5595
    assert nxt(engine, "bmm") == 5600


def test_bulk_allocation_less_than_cache_size(engine):
    # testNextValuesForSequenceAllocationLessThanCacheSize:521 — a bulk
    # allocation that FITS in the cached remainder is served from it
    engine.sql(
        "CREATE SEQUENCE blc START WITH 100 INCREMENT BY 5 "
        "MINVALUE 100 MAXVALUE 6000 CACHE 100"
    )
    assert nxt(engine, "blc") == 100
    assert engine.current_value("blc") == 100
    assert nxt(engine, "blc") == 105
    assert nxt(engine, "blc", 50) == 110
    assert engine.current_value("blc") == 355
    assert nxt(engine, "blc") == 360
    assert nxt(engine, "blc") == 365
    assert nxt(engine, "blc") == 370


def test_bulk_insufficient_cache_values(engine):
    # testNextValuesForInsufficentCacheValuesAllocationLessThanCacheSize:555
    engine.sql(
        "CREATE SEQUENCE bic START WITH 100 INCREMENT BY 5 "
        "MINVALUE 100 MAXVALUE 6000 CACHE 100"
    )
    for i in range(100, 356, 5):  # 52 single draws; cache has 48 < 50 left
        assert nxt(engine, "bic") == i
    assert engine.current_value("bic") == 355
    assert nxt(engine, "bic", 50) == 600
    assert engine.current_value("bic") == 845
    assert nxt(engine, "bic") == 850
    assert nxt(engine, "bic") == 855
    assert nxt(engine, "bic") == 860


def test_bulk_on_cycle_sequence_rejected(engine):
    # testNextValuesForSequenceWithCycles:591 —
    # NUM_SEQ_TO_ALLOCATE_NOT_SUPPORTED even far from the limit
    engine.sql(
        "CREATE SEQUENCE bcyc START WITH 100 INCREMENT BY 5 "
        "MINVALUE 100 MAXVALUE 900 CYCLE CACHE 100"
    )
    assert nxt(engine, "bcyc") == 100
    assert engine.current_value("bcyc") == 100
    assert nxt(engine, "bcyc") == 105
    with pytest.raises(ValueError, match="cycle"):
        nxt(engine, "bcyc", 1000)


def test_current_value_and_next_values_same_statement(engine):
    # testCurrentValueForAndNextValuesForExpressionsForSameSequence:627 —
    # a CURRENT VALUE sharing the statement returns the allocation's value
    engine.sql("CREATE SEQUENCE bcn START WITH 1 INCREMENT BY 1 CACHE 100")
    assert nxt(engine, "bcn") == 1
    assert engine.current_value("bcn") == 1
    assert nxt(engine, "bcn") == 2
    row = engine.sql(
        "SELECT CURRENT VALUE FOR bcn AS c, NEXT 1000 VALUES FOR bcn AS n "
        "FROM one_row"
    ).collect()[0]
    assert (row.c, row.n) == (101, 101)
    assert engine.current_value("bcn") == 1100
    assert nxt(engine, "bcn") == 1101


def test_multiple_next_values_same_sequence(engine):
    # testMultipleNextValuesForExpressionsForSameSequence:664 — only the
    # HIGHEST <n> is processed; every expression returns its start value
    engine.sql("CREATE SEQUENCE bms START WITH 1 INCREMENT BY 1 CACHE 100")
    assert nxt(engine, "bms") == 1
    assert engine.current_value("bms") == 1
    assert nxt(engine, "bms") == 2
    row = engine.sql(
        "SELECT NEXT 5 VALUES FOR bms AS a, NEXT 1000 VALUES FOR bms AS b "
        "FROM one_row"
    ).collect()[0]
    assert (row.a, row.b) == (101, 101)
    assert engine.current_value("bms") == 1100
    assert nxt(engine, "bms") == 1101


def test_multiple_different_expressions_same_sequence(engine):
    # testMultipleDifferentExpressionsForSameSequence:701 — NEXT VALUE,
    # NEXT n VALUES, CURRENT VALUE, NEXT m VALUES: all four return the
    # same value; allocation honors the highest <n>
    engine.sql("CREATE SEQUENCE bmd START WITH 1 INCREMENT BY 1 CACHE 100")
    assert nxt(engine, "bmd") == 1
    row = engine.sql(
        "SELECT NEXT VALUE FOR bmd AS a, NEXT 1000 VALUES FOR bmd AS b, "
        "CURRENT VALUE FOR bmd AS c, NEXT 999 VALUES FOR bmd AS d "
        "FROM one_row"
    ).collect()[0]
    assert row.a == row.b == row.c == row.d == 101
    assert engine.current_value("bmd") == 1100
    assert nxt(engine, "bmd") == 1101


def test_multiple_next_values_different_sequences(engine):
    # testMultipleNextValuesForExpressionsForDifferentSequences:746
    engine.sql("CREATE SEQUENCE bd1 START WITH 30 INCREMENT BY 3 CACHE 100")
    engine.sql("CREATE SEQUENCE bd2 START WITH 100 INCREMENT BY 5 CACHE 50")
    row = engine.sql(
        "SELECT NEXT 100 VALUES FOR bd1 AS a, NEXT 1000 VALUES FOR bd2 AS b "
        "FROM one_row"
    ).collect()[0]
    assert (row.a, row.b) == (30, 100)
    for i in range(330, 330 + 2 * 100, 3):
        assert engine.current_value("bd1") == i - 3
        assert nxt(engine, "bd1") == i
    for i in range(5100, 5100 + 2 * 1000, 5):
        assert engine.current_value("bd2") == i - 5
        assert nxt(engine, "bd2") == i


def test_explain_does_not_allocate(engine):
    # testExplainPlanValidatesSequences:778 / testExplainPlanForNextValuesFor:812
    engine.sql("CREATE SEQUENCE bex START WITH 30 INCREMENT BY 3 CACHE 100")
    engine.sql("EXPLAIN SELECT NEXT 1000 VALUES FOR bex AS v FROM one_row")
    assert nxt(engine, "bex", 1000) == 30  # nothing consumed by EXPLAIN
