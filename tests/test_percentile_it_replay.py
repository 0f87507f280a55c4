"""PercentileIT replay (end2end/PercentileIT.java) — Phoenix's
inverse-distribution aggregates use their OWN formulas, not the ANSI ones
Spark/DuckDB implement:

  * PERCENTILE_CONT: i = p*N + 0.5, k = floor(i), f = i - k, result =
    v[k]*(1-f) + v[k+1]*f, clamped at the edges
    (PercentileClientAggregator.evaluate) — PERCENTILE_CONT(0.9) over 1..9
    is 8.6 here, 8.2 under ANSI interpolation.
  * PERCENTILE_DISC: first value in the chosen order whose cumulative
    distribution reaches p (PercentileDiscClientAggregator).
  * PERCENT_RANK(v): fraction of values <= v (ASC) / > v (DESC).

Fixture is PercentileIT's OWN initATableValues:559 (NOT the canonical
ATABLE): a_integer per row = 1,2,3,7 | 6,5,4,9 | 8, b_string mostly 'c',
x_decimal NULL×6 then 0.1, 3.9, 3.3.
"""

from __future__ import annotations

import pytest

from tests.atable import ROWS, TENANT
from tests.conftest import SF_TEST_DIR

A_INTS = [1, 2, 3, 7, 6, 5, 4, 9, 8]
B_STRINGS = ["b", "c", "c", "b", "c", "c", "c", "c", "c"]
A_STRINGS = ["a"] * 4 + ["b"] * 4 + ["c"]
X_DECIMALS = [None] * 6 + [0.1, 3.9, 3.3]


@pytest.fixture(scope="module")
def engine(tmp_path_factory):
    from phoenix_spark.engine import Engine
    from phoenix_spark.session import get_spark

    spark = get_spark(
        app_name="phoenix_spark_tests", master="local[8]", shuffle_partitions=8
    )
    e = Engine(
        spark, sf_dir=SF_TEST_DIR,
        warehouse=str(tmp_path_factory.mktemp("pct_wh")),
    )
    e.sql(
        "create table ptable (organization_id char(15) not null, "
        "entity_id char(15) not null, a_string varchar(100), "
        "b_string varchar(100), a_integer integer, x_decimal decimal(31,10), "
        "constraint pk primary key (organization_id, entity_id))"
    )
    for i in range(9):
        xd = "null" if X_DECIMALS[i] is None else str(X_DECIMALS[i])
        e.sql(
            "upsert into ptable values "
            f"('{TENANT}', '{ROWS[i]}', '{A_STRINGS[i]}', '{B_STRINGS[i]}', "
            f"{A_INTS[i]}, {xd})"
        )
    return e


def scalar(engine, sql):
    rows = engine.sql(sql).collect()
    assert len(rows) == 1
    return rows[0][0]


def test_percentile_cont(engine):
    # PercentileIT.testPercentile:64
    got = scalar(engine, (
        "SELECT PERCENTILE_CONT(0.9) WITHIN GROUP (ORDER BY A_INTEGER ASC) "
        "AS p FROM ptable"
    ))
    assert round(float(got), 1) == 8.6


def test_percentile_cont_desc(engine):
    # testPercentileDesc:86
    got = scalar(engine, (
        "SELECT PERCENTILE_CONT(0.9) WITHIN GROUP (ORDER BY A_INTEGER DESC) "
        "AS p FROM ptable"
    ))
    assert round(float(got), 1) == 1.4


def test_percentile_cont_groupby(engine):
    # testPercentileWithGroupby:109 (ORDER BY added per the group-key-order
    # adaptation) — a={1,2,3,7} p=.9: i=4.1, k=4 >= N -> 7.0; b={4,5,6,9}:
    # 9.0; c={8}: 8.0
    rows = engine.sql(
        "SELECT A_STRING, PERCENTILE_CONT(0.9) WITHIN GROUP "
        "(ORDER BY A_INTEGER ASC) AS p FROM ptable GROUP BY A_STRING "
        "ORDER BY A_STRING"
    ).collect()
    assert [(r[0], round(float(r[1]), 1)) for r in rows] == [
        ("a", 7.0), ("b", 9.0), ("c", 8.0),
    ]


def test_percentile_cont_groupby_orderby_alias(engine):
    # testPercentileWithGroupbyAndOrderBy:144 — ORDER BY the select alias
    rows = engine.sql(
        "SELECT A_STRING, PERCENTILE_CONT(0.9) WITHIN GROUP "
        "(ORDER BY A_INTEGER ASC) AS PC FROM ptable GROUP BY A_STRING "
        "ORDER BY PC"
    ).collect()
    assert [(r[0], round(float(r[1]), 1)) for r in rows] == [
        ("a", 7.0), ("c", 8.0), ("b", 9.0),
    ]


def test_percentile_disc(engine):
    # testPercentileDiscAsc:179 / testPercentileDiscDesc:201
    got = scalar(engine, (
        "SELECT PERCENTILE_DISC(0.9) WITHIN GROUP (ORDER BY A_INTEGER ASC) "
        "AS p FROM ptable"
    ))
    assert int(got) == 9
    got = scalar(engine, (
        "SELECT PERCENTILE_DISC(0.9) WITHIN GROUP (ORDER BY A_INTEGER DESC) "
        "AS p FROM ptable"
    ))
    assert int(got) == 1


def test_percentile_disc_groupby(engine):
    # testPercentileDiscWithGroupby:223 + AndOrderBy:255
    rows = engine.sql(
        "SELECT A_STRING, PERCENTILE_DISC(0.5) WITHIN GROUP "
        "(ORDER BY A_INTEGER ASC) AS p FROM ptable GROUP BY A_STRING "
        "ORDER BY A_STRING"
    ).collect()
    assert [(r[0], int(r[1])) for r in rows] == [("a", 2), ("b", 5), ("c", 8)]
    rows = engine.sql(
        "SELECT A_STRING, PERCENTILE_DISC(0.5) WITHIN GROUP "
        "(ORDER BY A_INTEGER ASC) AS p FROM ptable GROUP BY A_STRING "
        "ORDER BY A_STRING DESC"
    ).collect()
    assert [(r[0], int(r[1])) for r in rows] == [("c", 8), ("b", 5), ("a", 2)]


def test_percent_rank(engine):
    # testPercentRank:287 — PERCENT_RANK(5) asc over nine values = 5/9
    got = scalar(engine, (
        "SELECT PERCENT_RANK(5) WITHIN GROUP (ORDER BY A_INTEGER ASC) AS r "
        "FROM ptable"
    ))
    assert round(float(got), 2) == 0.56


def test_percent_rank_negative_and_desc(engine):
    # testPercentRankWithNegativeNumeric:309 / testPercentRankDesc:332
    got = scalar(engine, (
        "SELECT PERCENT_RANK(-2) WITHIN GROUP (ORDER BY A_INTEGER ASC) AS r "
        "FROM ptable"
    ))
    assert round(float(got), 2) == 0.0
    got = scalar(engine, (
        "SELECT PERCENT_RANK(8.9) WITHIN GROUP (ORDER BY A_INTEGER DESC) AS r "
        "FROM ptable"
    ))
    assert round(float(got), 2) == 0.11


def test_percent_rank_varchar_and_decimal(engine):
    # testPercentRankDescOnVARCHARColumn:355 / DescOnDECIMALColumn:378
    got = scalar(engine, (
        "SELECT PERCENT_RANK('ba') WITHIN GROUP (ORDER BY A_STRING DESC) AS r "
        "FROM ptable"
    ))
    assert round(float(got), 2) == 0.11
    got = scalar(engine, (
        "SELECT PERCENT_RANK(2) WITHIN GROUP (ORDER BY x_decimal ASC) AS r "
        "FROM ptable"
    ))
    assert round(float(got), 2) == 0.33


def test_multiple_percent_ranks_one_select(engine):
    # testMultiplePercentRanksOnSelect:400
    row = engine.sql(
        "SELECT PERCENT_RANK(2) WITHIN GROUP (ORDER BY x_decimal ASC) AS r1, "
        "PERCENT_RANK(8.9) WITHIN GROUP (ORDER BY A_INTEGER DESC) AS r2 "
        "FROM ptable"
    ).collect()[0]
    assert (round(float(row.r1), 2), round(float(row.r2), 2)) == (0.33, 0.11)


def test_percentiles_on_desc_pk_column(engine):
    # testPercentileContOnDescPKColumn:427 / PercentRank:451 / Disc:474 —
    # a 3-row table with long_pk 1, 2, 3 stored DESC
    engine.sql(
        "create table pdesc (long_pk bigint not null, v varchar, "
        "constraint pk primary key (long_pk desc))"
    )
    for i in (1, 2, 3):
        engine.sql(f"upsert into pdesc values ({i}, 'v{i}')")
    got = scalar(engine, (
        "SELECT PERCENTILE_CONT(1) WITHIN GROUP (ORDER BY long_pk ASC) AS p "
        "FROM pdesc"
    ))
    assert round(float(got), 1) == 3.0
    got = scalar(engine, (
        "SELECT PERCENT_RANK(2) WITHIN GROUP (ORDER BY long_pk ASC) AS r "
        "FROM pdesc"
    ))
    assert round(float(got), 2) == 0.67
    got = scalar(engine, (
        "SELECT PERCENTILE_DISC(0.4) WITHIN GROUP (ORDER BY long_pk DESC) AS p "
        "FROM pdesc"
    ))
    assert int(got) == 2


def test_percentile_on_empty_table(engine):
    # testPercentileOnEmptyTable:497 — one row with NULL
    engine.sql(
        "create table pempty (k bigint not null, a_integer integer, "
        "constraint pk primary key (k))"
    )
    got = engine.sql(
        "SELECT PERCENTILE_CONT(0.5) WITHIN GROUP (ORDER BY A_INTEGER ASC) "
        "AS p FROM pempty"
    ).collect()
    assert len(got) == 1 and got[0].p is None
