"""BaseQueryIT-family replay, part 2: AggregateQueryIT, RangeScanIT,
UngroupedIT, IntArithmeticIT, InQueryIT, PointInTimeScanQueryIT
(end2end/*.java) — the reference's comparison/arithmetic/IN/aggregate SELECT
matrix over ATABLE, parameterized by BaseQueryIT.allIndexes() (NO_INDEX +
the three GLOBAL_INDEX_DDLS covered variants; results must not depend on
the access path).

Adaptations (same conventions as test_query_it_replay.py):
  * JDBC binds (?/:1) are inlined as literals.
  * Row order: where the IT reads rows without ORDER BY (Phoenix returns
    PK/scan order), replays compare as sorted lists or use the IT's own
    set-style assertValueEqualsResultSet.
  * HBase region-split halves of tests (AggregateQueryIT
    .testSplitWithCachedMeta's admin.split) have no logical counterpart;
    the query semantics around them are replayed.
  * Mutating scenarios run on fresh function-scoped tables so the shared
    per-index-variant fixture stays immutable (the reference orders methods
    instead — e.g. UngroupedIT's FixMethodOrder(NAME_ASCENDING) just makes
    the mutating zTest run last).
"""

from __future__ import annotations

import pytest

from tests.atable import ROWS, TENANT, create_atable
from tests.conftest import SF_TEST_DIR
from tests.test_query_it_replay import INDEX_DDLS

A_VALUE, B_VALUE, C_VALUE, E_VALUE = "a", "b", "c", "e"
(ROW1, ROW2, ROW3, ROW4, ROW5, ROW6, ROW7, ROW8, ROW9) = ROWS


@pytest.fixture(scope="module")
def spark():
    from phoenix_spark.session import get_spark

    return get_spark(
        app_name="phoenix_spark_tests", master="local[8]", shuffle_partitions=8
    )


@pytest.fixture(scope="module", params=list(range(len(INDEX_DDLS))),
                ids=["no_index", "ix_desc", "ix_composite", "ix_asc"])
def engine(request, spark, tmp_path_factory):
    from phoenix_spark.engine import Engine

    e = Engine(
        spark, sf_dir=SF_TEST_DIR,
        warehouse=str(tmp_path_factory.mktemp(f"qit2_wh{request.param}")),
    )
    create_atable(e)
    ddl = INDEX_DDLS[request.param]
    if ddl:
        e.sql(ddl.format(ix=f"qit2_ix{request.param}", t="atable"))
    return e


@pytest.fixture()
def fresh_engine(spark, tmp_path):
    from phoenix_spark.engine import Engine

    e = Engine(spark, sf_dir=SF_TEST_DIR, warehouse=str(tmp_path / "wh"))
    create_atable(e)
    return e


def vals(engine, sql):
    return [r[0] for r in engine.sql(sql).collect()]


def rows(engine, sql):
    return [tuple(r) for r in engine.sql(sql).collect()]


# --- AggregateQueryIT.java ----------------------------------------------------


def test_group_by_plus_one(engine):
    # AggregateQueryIT.testGroupByPlusOne:35
    got = vals(engine, (
        f"SELECT a_integer+1 AS v FROM atable WHERE organization_id='{TENANT}' "
        "and a_integer = 5 GROUP BY a_integer+1"
    ))
    assert got == [6]


def test_group_by_same_alias_as_column(engine):
    # AggregateQueryIT.testSplitWithCachedMeta:54 — the query half (the
    # admin.split() re-check is HBase physicality)
    got = rows(engine, (
        "SELECT a_string, b_string, count(1) AS c FROM atable "
        f"WHERE organization_id='{TENANT}' and entity_id<='{ROW4}' "
        "GROUP BY a_string,b_string ORDER BY a_string, b_string"
    ))
    assert got == [
        (A_VALUE, B_VALUE, 2), (A_VALUE, C_VALUE, 1), (A_VALUE, E_VALUE, 1),
    ]


def test_count_is_null(engine):
    # AggregateQueryIT.testCountIsNull:121
    assert vals(engine, "SELECT count(1) AS c FROM atable WHERE X_DECIMAL is null") == [6]


def test_count_is_not_null(engine):
    # AggregateQueryIT.testCountIsNotNull:176
    assert vals(
        engine, "SELECT count(1) AS c FROM atable WHERE X_DECIMAL is not null"
    ) == [3]


def test_count_with_no_scan_ranges(engine):
    # AggregateQueryIT.testCountWithNoScanRanges:136 — ungrouped aggregates
    # over an empty scan: COUNT row still exists, HAVING can remove it,
    # OFFSET skips it, constants project alongside, SUM is NULL
    base = "FROM atable WHERE organization_id = 'not_existing_organization_id'"
    assert vals(engine, f"SELECT count(1) AS c {base}") == [0]
    assert rows(engine, f"SELECT count(1) AS c {base} having count(*)>0") == []
    assert rows(engine, f"SELECT count(1) AS c {base} limit 1 offset 1") == []
    assert rows(engine, f"SELECT count(1) AS c, 123 AS k {base}") == [(0, 123)]
    got = rows(engine, f"SELECT count(1) AS c, sum(x_decimal) AS s {base}")
    assert len(got) == 1 and got[0][0] == 0 and got[0][1] is None


def test_in_filter_on_key(engine):
    # AggregateQueryIT.testInFilterOnKey:185
    got = vals(engine, (
        "SELECT count(entity_id) AS c FROM atable "
        f"WHERE organization_id IN ('{TENANT}','{TENANT}')"
    ))
    assert got == [9]


# --- RangeScanIT.java ---------------------------------------------------------


def test_negate_expression(engine):
    # RangeScanIT.testNegateExpression:48
    assert vals(engine, "SELECT entity_id FROM atable where A_INTEGER - 4 = -1") == [ROW3]


def test_int_equality_filter_with_comment(engine):
    # RangeScanIT.testIntEqualityFilter:62 — inline /* comment */ survives
    got = rows(engine, (
        "SELECT a_string, /* comment ok? */ b_string FROM atable "
        f"WHERE '{TENANT}'=organization_id and 5=a_integer"
    ))
    assert got == [(B_VALUE, C_VALUE)]


def test_int_range_filter(fresh_engine):
    # RangeScanIT.testIntRangeFilter:80 — mutates ROW4's a_integer to -10
    # first, so it runs on a fresh table
    e = fresh_engine
    e.sql(
        "upsert into atable (ORGANIZATION_ID, ENTITY_ID, A_INTEGER) "
        f"VALUES ('{TENANT}', '{ROW4}', -10)"
    )
    q = f"SELECT entity_id FROM atable WHERE organization_id='{TENANT}' and "
    assert sorted(vals(e, q + "a_integer >= 7")) == [ROW7, ROW8, ROW9]
    assert sorted(vals(e, q + "a_integer < 2")) == [ROW1, ROW4]
    assert sorted(vals(e, q + "a_integer <= 2")) == [ROW1, ROW2, ROW4]
    assert vals(e, q + "a_integer >= 9") == [ROW9]


def test_unbound_range_scans(engine):
    # RangeScanIT.testUnboundRangeScan1:118 / testUnboundRangeScan2:151 —
    # open-ended PK-prefix ranges return every row
    got = vals(engine, (
        f"SELECT entity_id FROM atable WHERE organization_id <= '{TENANT}' "
        "ORDER BY entity_id"
    ))
    assert got == list(ROWS)
    got = vals(engine, (
        f"SELECT entity_id FROM atable WHERE organization_id >= '{TENANT}' "
        "ORDER BY entity_id"
    ))
    assert got == list(ROWS)


def test_upper_lower_bound_range_scan(engine):
    # RangeScanIT.testUpperLowerBoundRangeScan:184
    got = vals(engine, (
        f"SELECT entity_id FROM atable WHERE organization_id='{TENANT}' and "
        "substr(entity_id,1,3) > '00A' and substr(entity_id,1,3) < '00C' "
        "ORDER BY entity_id"
    ))
    assert got == [ROW5, ROW6, ROW7, ROW8]


def test_upper_bound_range_scan(engine):
    # RangeScanIT.testUpperBoundRangeScan:207
    got = vals(engine, (
        f"SELECT entity_id FROM atable WHERE organization_id='{TENANT}' and "
        "substr(entity_id,1,3) >= '00B' ORDER BY entity_id"
    ))
    assert got == [ROW5, ROW6, ROW7, ROW8, ROW9]


def test_lower_bound_range_scan(engine):
    # RangeScanIT.testLowerBoundRangeScan:232
    got = vals(engine, (
        f"SELECT entity_id FROM atable WHERE organization_id='{TENANT}' and "
        "substr(entity_id,1,3) < '00B' ORDER BY entity_id"
    ))
    assert got == [ROW1, ROW2, ROW3, ROW4]


# --- UngroupedIT.java ---------------------------------------------------------


def test_ungrouped_aggregation(engine):
    # UngroupedIT.testUngroupedAggregation:44 (run twice in the IT to check
    # client cache reuse — second run covered by the other variants here)
    got = vals(engine, (
        f"SELECT count(1) AS c FROM atable WHERE organization_id='{TENANT}' "
        f"and a_string = '{B_VALUE}'"
    ))
    assert got == [4]


def test_ungrouped_aggregation_no_where(engine):
    # UngroupedIT.testUngroupedAggregationNoWhere:73
    assert vals(engine, "SELECT count(*) AS c FROM atable") == [9]


def test_sum_over_null_integer_column(fresh_engine):
    # UngroupedIT.zTestSumOverNullIntegerColumn:88 — SUM ignores the NULLed
    # row, then an UPSERT SELECT nulls the whole column and SUM is NULL
    e = fresh_engine
    e.sql(
        "UPSERT INTO atable (organization_id,entity_id,a_integer) "
        f"VALUES('{TENANT}','{ROW3}',NULL)"
    )
    got = rows(e, "SELECT sum(a_integer) AS s FROM atable a")
    assert got == [(42,)]  # 45 - 3
    e.sql(
        "UPSERT INTO atable (organization_id,entity_id,a_integer) "
        "SELECT organization_id, entity_id, CAST(null AS integer) FROM atable"
    )
    got = rows(e, "SELECT sum(a_integer) AS s FROM atable a")
    assert got == [(None,)]


# --- IntArithmeticIT.java -----------------------------------------------------


def test_int_subtraction_expression(engine):
    # IntArithmeticIT.testIntSubtractionExpression:47
    got = sorted(vals(engine, "SELECT entity_id FROM atable where A_INTEGER - 4 <= 0"))
    assert got == [ROW1, ROW2, ROW3, ROW4]


def test_select_with_subtraction_expression(engine):
    # IntArithmeticIT.testSelectWithSubtractionExpression:58
    got = rows(engine, (
        "SELECT entity_id, x_integer - 4 AS d FROM atable where x_integer - 4 = 0"
    ))
    assert got == [(ROW8, 0)]


def test_constant_subtraction_expression(engine):
    # IntArithmeticIT.testConstantSubtractionExpression:72
    assert vals(engine, "SELECT entity_id FROM atable where A_INTEGER = 5 - 1 - 2") == [ROW2]


def test_int_divide_expression(engine):
    # IntArithmeticIT.testIntDivideExpression:85 — INTEGER division: 8/3=2
    # is excluded, only 9/3=3 passes
    assert vals(engine, "SELECT entity_id FROM atable where A_INTEGER / 3 > 2") == [ROW9]


def test_int_to_decimal_divide_expression(engine):
    # IntArithmeticIT.testIntToDecimalDivideExpression:97 — decimal divisor
    # promotes: 7/3.0, 8/3.0, 9/3.0 all > 2
    got = sorted(vals(engine, "SELECT entity_id FROM atable where A_INTEGER / 3.0 > 2"))
    assert got == [ROW7, ROW8, ROW9]


def test_constant_divide_expression(engine):
    # IntArithmeticIT.testConstantDivideExpression:107
    assert vals(engine, "SELECT entity_id FROM atable where A_INTEGER = 9 / 3 / 3") == [ROW1]


def test_select_with_divide_expression(engine):
    # IntArithmeticIT.testSelectWithDivideExpression:120
    got = rows(engine, "SELECT entity_id, a_integer/3 AS d FROM atable where a_integer = 9")
    assert got == [(ROW9, 3)]


def test_int_multiply_expression(engine):
    # IntArithmeticIT.testIntMultiplyExpression:147
    assert vals(engine, "SELECT entity_id FROM atable where A_INTEGER * 2 = 16") == [ROW8]


def test_int_to_decimal_multiply_expression(engine):
    # IntArithmeticIT.testIntToDecimalMultiplyExpression:158
    got = sorted(vals(engine, "SELECT entity_id FROM atable where A_INTEGER * 1.5 > 9"))
    assert got == [ROW7, ROW8, ROW9]


def test_int_add_expression(engine):
    # IntArithmeticIT.testIntAddExpression:170
    assert vals(engine, "SELECT entity_id FROM atable where A_INTEGER + 2 = 4") == [ROW2]


# --- InQueryIT.java -----------------------------------------------------------


def test_in_list_skip_scan(engine):
    # InQueryIT.testInListSkipScan:47
    got = rows(engine, (
        "SELECT entity_id, b_string FROM atable "
        f"WHERE organization_id='{TENANT}' and entity_id IN ('{ROW2}','{ROW4}')"
    ))
    assert sorted(got) == [(ROW2, C_VALUE), (ROW4, B_VALUE)]


def test_date_in_list(engine):
    # InQueryIT.testDateInList:74 — binds inlined: epoch-0 plus the fixture
    # date; only ROW1 (offset 0, a_integer 1 < 4) matches
    got = vals(engine, (
        "SELECT entity_id FROM atable WHERE a_date IN "
        "(TO_DATE('1970-01-01 00:00:00'), TO_DATE('2024-06-01 00:00:00')) "
        "AND a_integer < 4"
    ))
    assert got == [ROW1]


def test_simple_in_list_statement(engine):
    # InQueryIT.testSimpleInListStatement:90
    got = sorted(vals(engine, (
        f"SELECT entity_id FROM atable WHERE organization_id='{TENANT}' "
        "AND a_integer IN (2,4)"
    )))
    assert got == [ROW2, ROW4]


def test_partially_qualified_rvc_in_list(engine):
    # InQueryIT.testPartiallyQualifiedRVCInList:103
    got = sorted(vals(engine, (
        "SELECT entity_id FROM atable WHERE (a_integer,a_string) "
        "IN ((2,'a'),(5,'b'))"
    )))
    assert got == [ROW2, ROW5]


def test_fully_qualified_rvc_in_list(engine):
    # InQueryIT.testFullyQualifiedRVCInList:115 — :1/:2 named binds inlined
    got = sorted(vals(engine, (
        "SELECT entity_id FROM atable WHERE "
        "(a_integer, a_string, organization_id, entity_id) IN "
        f"((2,'a','{TENANT}','{ROW2}'),(5,'b','{TENANT}','{ROW5}'))"
    )))
    assert got == [ROW2, ROW5]


def test_one_in_list_statement(engine):
    # InQueryIT.testOneInListStatement:130
    got = sorted(vals(engine, (
        f"SELECT entity_id FROM atable WHERE organization_id='{TENANT}' "
        f"AND b_string IN ('{E_VALUE}')"
    )))
    assert got == [ROW3, ROW6, ROW9]


def test_mixed_type_in_list_statement(engine):
    # InQueryIT.testMixedTypeInListStatement:149 — INT and BIGINT literals
    # in one IN list over a BIGINT column (Integer.MAX_VALUE + 1)
    got = sorted(vals(engine, (
        f"SELECT entity_id FROM atable WHERE organization_id='{TENANT}' "
        "AND x_long IN (5, 2147483648)"
    )))
    assert got == [ROW7, ROW9]


def test_row_key_single_in(engine):
    # InQueryIT.testRowKeySingleIn:168
    got = sorted(vals(engine, (
        f"SELECT entity_id FROM atable WHERE organization_id='{TENANT}' "
        f"and entity_id IN ('{ROW2}','{ROW6}','{ROW8}')"
    )))
    assert got == [ROW2, ROW6, ROW8]


def test_row_key_multi_in(engine):
    # InQueryIT.testRowKeyMultiIn:190
    got = sorted(vals(engine, (
        f"SELECT entity_id FROM atable WHERE organization_id='{TENANT}' "
        f"and entity_id IN ('{ROW2}','{ROW6}','{ROW9}') "
        f"and a_string IN ('{B_VALUE}', '{C_VALUE}')"
    )))
    assert got == [ROW6, ROW9]


# --- PointInTimeScanQueryIT.java (fresh tables, SCN connections) --------------


def test_point_in_time_scan(fresh_engine):
    # PointInTimeScanQueryIT.testPointInTimeScan:40
    e = fresh_engine
    stmt = (
        "upsert into atable (ORGANIZATION_ID, ENTITY_ID, A_INTEGER) "
        "VALUES ('{t}', '{r}', {v})"
    )
    e.sql(stmt.format(t=TENANT, r=ROW4, v=5))
    scn = e.commit_ts("atable")
    e.sql(stmt.format(t=TENANT, r=ROW4, v=9))
    got = e.with_scn(scn).sql(
        "SELECT organization_id, a_string AS a FROM atable "
        f"WHERE organization_id='{TENANT}' and a_integer = 5 ORDER BY a"
    ).collect()
    # at the SCN both ROW4 (now 5, a_string 'a') and ROW5 (5, 'b') match
    assert [(r.organization_id, r.a) for r in got] == [
        (TENANT, A_VALUE), (TENANT, B_VALUE),
    ]


def test_point_in_time_limited_scan(fresh_engine):
    # PointInTimeScanQueryIT.testPointInTimeLimitedScan:97 — LIMIT 2 without
    # ORDER BY: any 2 of the SCN-visible matches (the IT itself accepts two
    # alternative result sets depending on the access path)
    e = fresh_engine
    stmt = (
        "upsert into atable (ORGANIZATION_ID, ENTITY_ID, A_INTEGER) "
        "VALUES ('{t}', '{r}', {v})"
    )
    e.sql(stmt.format(t=TENANT, r=ROW1, v=6))
    scn = e.commit_ts("atable")
    e.sql(stmt.format(t=TENANT, r=ROW1, v=0))
    got = e.with_scn(scn).sql(
        "SELECT a_integer, b_string FROM atable "
        f"WHERE organization_id='{TENANT}' and a_integer <= 5 limit 2"
    ).collect()
    visible = {(2, C_VALUE), (3, E_VALUE), (4, B_VALUE), (5, C_VALUE)}
    assert len(got) == 2
    assert {(r.a_integer, r.b_string) for r in got} <= visible
