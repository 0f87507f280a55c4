"""DateTimeIT replay (end2end/DateTimeIT.java) — the densest
silent-divergence surface per SURVEY's hard-parts list: Phoenix DATE/TIME
literals carry time-of-day, TO_DATE's Joda ISO default parser (week/ordinal
dates), java.text patterns incl. ':SSS' millis and zone args, WEEK /
DAYOFWEEK / DAYOFYEAR numbering, date±number arithmetic in days with
DECIMAL day differences.

Each test cites the reference method; expected values are the IT's inline
asserts."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest

from tests.conftest import SF_TEST_DIR


@pytest.fixture(scope="module")
def engine(tmp_path_factory):
    from phoenix_spark.engine import Engine
    from phoenix_spark.session import get_spark

    spark = get_spark(
        app_name="phoenix_spark_tests", master="local[8]", shuffle_partitions=8
    )
    return Engine(
        spark, sf_dir=SF_TEST_DIR,
        warehouse=str(tmp_path_factory.mktemp("dt_wh")),
    )


def one(engine, sql):
    out = engine.sql(sql).collect()
    assert len(out) == 1
    return out[0][0]


def rows(engine, sql):
    return [tuple(r) for r in engine.sql(sql).collect()]


def test_year_function_date(engine):
    # DateTimeIT.java:555 — TO_DATE across the Joda-ISO default parser,
    # explicit java.text patterns, and the 3-arg timezone form
    cases = [
        ("YEAR(TO_DATE('2008-01-01', 'yyyy-MM-dd'))", 2008),
        ("YEAR(TO_DATE('2004-12-13 10:13:18', 'yyyy-MM-dd hh:mm:ss'))", 2004),
        ("YEAR(TO_DATE('2015-01-27T16:17:57+00:00'))", 2015),
        ("YEAR(TO_DATE('2005-12-13 10:13:18'))", 2005),
        ("YEAR(TO_DATE('2006-12-13'))", 2006),
        ("YEAR(TO_DATE('2015-W05'))", 2015),
        ("YEAR(TO_DATE('Sat, 3 Feb 2008 03:05:06 GMT', "
         "'EEE, d MMM yyyy HH:mm:ss z', 'UTC'))", 2008),
    ]
    for expr, want in cases:
        assert one(engine, f"SELECT {expr} AS v") == want, expr


def test_year_function_timestamp(engine):
    # DateTimeIT.java:575 — incl. ISO week dates and ordinal dates
    cases = [
        ("YEAR(TO_TIMESTAMP('2015-01-27T16:17:57+00:00'))", 2015),
        ("YEAR(TO_TIMESTAMP('2015-01-27T16:17:57Z'))", 2015),
        ("YEAR(TO_TIMESTAMP('2015-W10-3'))", 2015),
        ("YEAR(TO_TIMESTAMP('2015-W05'))", 2015),
        ("YEAR(TO_TIMESTAMP('2015-063'))", 2015),
        ("YEAR(TO_TIMESTAMP('2006-12-13'))", 2006),
        ("YEAR(TO_TIMESTAMP('2004-12-13 10:13:18', 'yyyy-MM-dd hh:mm:ss'))",
         2004),
        ("YEAR(TO_TIMESTAMP('Sat, 3 Feb 2008 03:05:06 GMT', "
         "'EEE, d MMM yyyy HH:mm:ss z', 'UTC'))", 2008),
    ]
    for expr, want in cases:
        assert one(engine, f"SELECT {expr} AS v") == want, expr


def _make_funcs_table(engine, name):
    engine.sql(
        f"CREATE TABLE IF NOT EXISTS {name} (k1 INTEGER NOT NULL, "
        "dates DATE, timestamps TIMESTAMP, times TIME, "
        "unsignedDates UNSIGNED_DATE, unsignedTimestamps UNSIGNED_TIMESTAMP, "
        "unsignedTimes UNSIGNED_TIME CONSTRAINT pk PRIMARY KEY (k1))"
    )


def test_year_func_against_columns(engine):
    # DateTimeIT.java:597 — incl. the ':SSS' millis pattern and UNSIGNED_*
    _make_funcs_table(engine, "dt_year")
    for k, d in ((1, "2004"), (2, "2005"), (3, "2006")):
        engine.sql(
            f"UPSERT INTO dt_year VALUES ({k}, "
            f"TO_DATE('{d}-03-01 00:00:00'), "
            "TO_TIMESTAMP('2006-02-01 00:00:00'), "
            "TO_TIME('2008-02-01 00:00:00'), "
            "TO_DATE('2010-03-01 00:00:00:896', 'yyyy-MM-dd HH:mm:ss:SSS'), "
            "TO_TIMESTAMP('2012-02-01'), TO_TIME('2015-02-01 00:00:00'))"
        )
    got = rows(engine, (
        "SELECT k1, YEAR(timestamps), YEAR(times), YEAR(unsignedDates), "
        "YEAR(unsignedTimestamps), YEAR(unsignedTimes) FROM dt_year "
        "WHERE YEAR(dates) = 2004"
    ))
    assert got == [(1, 2006, 2008, 2010, 2012, 2015)]


def test_month_func_against_columns(engine):
    # DateTimeIT.java:631
    _make_funcs_table(engine, "dt_month")
    for k, m in ((1, "03"), (2, "04"), (3, "05")):
        engine.sql(
            f"UPSERT INTO dt_month VALUES ({k}, "
            f"TO_DATE('2004-{m}-10 00:00:00'), "
            "TO_TIMESTAMP('2006-04-12 00:00:00'), "
            "TO_TIME('2008-05-16 00:00:00'), "
            "TO_DATE('2010-06-20 00:00:00:789', 'yyyy-MM-dd HH:mm:ss:SSS'), "
            "TO_TIMESTAMP('2012-07-28'), TO_TIME('2015-12-25 00:00:00'))"
        )
    got = rows(engine, (
        "SELECT k1, MONTH(timestamps), MONTH(times), MONTH(unsignedDates), "
        "MONTH(unsignedTimestamps), MONTH(unsignedTimes) FROM dt_month "
        "WHERE MONTH(dates) = 3"
    ))
    assert got == [(1, 4, 5, 6, 7, 12)]


def test_second_minute_func_against_columns(engine):
    # DateTimeIT.java:685 / :801
    _make_funcs_table(engine, "dt_sec")
    for k, s in ((1, "00:00:20"), (2, "00:20:30"), (3, "00:50:30")):
        engine.sql(
            f"UPSERT INTO dt_sec VALUES ({k}, "
            "TO_DATE('2004-03-01 00:00:10'), "
            f"TO_TIMESTAMP('2006-04-12 {s}'), "
            "TO_TIME('2008-05-16 10:00:30'), "
            "TO_DATE('2010-06-20 00:00:40:789', 'yyyy-MM-dd HH:mm:ss:SSS'), "
            "TO_TIMESTAMP('2012-07-28'), TO_TIME('2015-12-25 00:00:50'))"
        )
    got = rows(engine, (
        "SELECT k1, SECOND(dates), SECOND(times), SECOND(unsignedDates), "
        "SECOND(unsignedTimestamps), SECOND(unsignedTimes) FROM dt_sec "
        "WHERE SECOND(timestamps) = 20"
    ))
    assert got == [(1, 10, 30, 40, 0, 50)]


def test_week_func_against_columns(engine):
    # DateTimeIT.java:719 — WEEK('2004-01-10')=2, WEEK('2006-04-12')=15,
    # WEEK('2008-05-16')=20 (Joda/ISO week-of-year)
    engine.sql(
        "CREATE TABLE IF NOT EXISTS dt_week (k1 INTEGER NOT NULL, dates DATE, "
        "timestamps TIMESTAMP, times TIME CONSTRAINT pk PRIMARY KEY (k1))"
    )
    engine.sql(
        "UPSERT INTO dt_week VALUES (1, TO_DATE('2004-01-10 10:00:10'), "
        "TO_TIMESTAMP('2006-04-12 08:00:20'), TO_TIME('2008-05-16 10:00:30'))"
    )
    engine.sql(
        "UPSERT INTO dt_week VALUES (2, TO_DATE('2004-01-10 10:00:10'), "
        "TO_TIMESTAMP('2006-05-18 08:00:20'), TO_TIME('2008-05-16 10:00:30'))"
    )
    got = rows(engine, (
        "SELECT k1, WEEK(dates), WEEK(times) FROM dt_week "
        "WHERE WEEK(timestamps) = 15"
    ))
    assert got == [(1, 2, 20)]


def test_hour_func_against_columns(engine):
    # DateTimeIT.java:746 — dates parsed via the EEE/z pattern + zone arg
    engine.sql(
        "CREATE TABLE IF NOT EXISTS dt_hour (k1 INTEGER NOT NULL, dates DATE, "
        "timestamps TIMESTAMP, times TIME CONSTRAINT pk PRIMARY KEY (k1))"
    )
    for k, h in ((1, 15), (2, 10), (3, 8)):
        engine.sql(
            f"UPSERT INTO dt_hour VALUES ({k}, "
            "TO_DATE('Sat, 3 Feb 2008 03:05:06 GMT', "
            "'EEE, d MMM yyyy HH:mm:ss z', 'UTC'), "
            f"TO_TIMESTAMP('2006-04-12 {h:02d}:10:20'), "
            "TO_TIME('2008-05-16 20:40:30'))"
        )
    got = rows(engine, (
        "SELECT k1, HOUR(dates), HOUR(times) FROM dt_hour "
        "WHERE HOUR(timestamps) = 15"
    ))
    assert got == [(1, 3, 20)]


def test_day_of_month_week_year_against_columns(engine):
    # DateTimeIT.java:831 / :859 / :883 — DAYOFWEEK is ISO Monday=1
    # (2013-04-09 Tuesday → 2, 2014-05-18 Sunday → 7, 2015-06-27 Sat → 6)
    engine.sql(
        "CREATE TABLE IF NOT EXISTS dt_dow (k1 INTEGER NOT NULL, dates DATE, "
        "timestamps TIMESTAMP, times TIME CONSTRAINT pk PRIMARY KEY (k1))"
    )
    engine.sql(
        "UPSERT INTO dt_dow VALUES (1, TO_DATE('2012-03-08 11:01:10'), "
        "TO_TIMESTAMP('2013-06-16 12:02:20'), TO_TIME('2014-09-23 13:03:30'))"
    )
    engine.sql(
        "UPSERT INTO dt_dow VALUES (2, TO_DATE('2013-04-09 11:02:10'), "
        "TO_TIMESTAMP('2014-05-18 12:03:20'), TO_TIME('2015-06-27 13:04:30'))"
    )
    got = rows(engine, (
        "SELECT k1, DAYOFWEEK(dates), DAYOFWEEK(timestamps) FROM dt_dow "
        "WHERE DAYOFWEEK(times) = 6"
    ))
    assert got == [(2, 2, 7)]

    engine.sql(
        "CREATE TABLE IF NOT EXISTS dt_dom (k1 INTEGER NOT NULL, dates DATE, "
        "timestamps TIMESTAMP, times TIME CONSTRAINT pk PRIMARY KEY (k1))"
    )
    engine.sql(
        "UPSERT INTO dt_dom VALUES (1, TO_DATE('2004-01-08 10:00:10'), "
        "TO_TIMESTAMP('2006-04-12 08:00:20'), TO_TIME('2008-05-26 11:00:30'))"
    )
    engine.sql(
        "UPSERT INTO dt_dom VALUES (2, TO_DATE('2004-01-18 10:00:10'), "
        "TO_TIMESTAMP('2006-05-22 08:00:20'), TO_TIME('2008-12-30 11:00:30'))"
    )
    got = rows(engine, (
        "SELECT k1, DAYOFMONTH(dates), DAYOFMONTH(times) FROM dt_dom "
        "WHERE DAYOFMONTH(timestamps) = 12"
    ))
    assert got == [(1, 8, 26)]

    engine.sql(
        "CREATE TABLE IF NOT EXISTS dt_doy (k1 INTEGER NOT NULL, dates DATE, "
        "timestamps TIMESTAMP, times TIME CONSTRAINT pk PRIMARY KEY (k1))"
    )
    engine.sql(
        "UPSERT INTO dt_doy VALUES (1, TO_DATE('2012-03-01 11:01:10'), "
        "TO_TIMESTAMP('2013-02-01 12:02:20'), TO_TIME('2014-01-15 13:03:30'))"
    )
    engine.sql(
        "UPSERT INTO dt_doy VALUES (2, TO_DATE('2013-04-09 11:02:10'), "
        "TO_TIMESTAMP('2014-05-18 12:03:20'), TO_TIME('2015-06-27 13:04:30'))"
    )
    got = rows(engine, (
        "SELECT k1, DAYOFYEAR(dates), DAYOFYEAR(timestamps) FROM dt_doy "
        "WHERE DAYOFYEAR(times) = 15"
    ))
    assert got == [(1, 61, 32)]


def test_date_literals_carry_time(engine):
    # DateTimeIT.java:448-504 — DATE literals hold full datetimes
    assert one(engine, (
        "SELECT (DATE '2012-09-08 07:08:23' = DATE '2012-09-08 07:08:23') AS v"
    )) is True
    assert one(engine, (
        "SELECT (DATE '2012-09-08 07:08:23' = TIMESTAMP '2012-09-08 07:08:23') AS v"
    )) is True
    assert one(engine, (
        "SELECT (DATE '2012-09-08 07:08:23' > DATE '2012-09-08 07:08:23') AS v"
    )) is False
    assert one(engine, "SELECT DATE '2012-09-08 07:08:23' AS v") == datetime(
        2012, 9, 8, 7, 8, 23
    )
    assert one(engine, (
        "SELECT (DATE '2012-09-08 07:08:23' = TO_DATE('2012-09-08 07:08:23')) AS v"
    )) is True


DATE_FIXTURE_START = datetime(2024, 4, 1, 0, 0, 0)


@pytest.fixture(scope="module")
def date_table(engine):
    # DateTimeIT.initDateTableValues (:100-182): features A..F at
    # startDate + 0,2,4,6,8,10 days
    engine.sql(
        "CREATE TABLE dt_metrics (organization_id CHAR(15) NOT NULL, "
        "d DATE NOT NULL, feature VARCHAR, unique_users INTEGER "
        "CONSTRAINT pk PRIMARY KEY (organization_id, d))"
    )
    for i, f in enumerate("ABCDEF"):
        d = DATE_FIXTURE_START + timedelta(days=2 * i)
        engine.sql(
            "UPSERT INTO dt_metrics VALUES ('tenant1', "
            f"TO_DATE('{d:%Y-%m-%d %H:%M:%S}'), '{f}', {10 * (i + 1)})"
        )
    return engine


def test_date_subtraction_compare_number(engine, date_table):
    # DateTimeIT.java:1696 — date - date is DECIMAL days
    end = DATE_FIXTURE_START + timedelta(days=6)
    got = rows(engine, (
        "SELECT feature FROM dt_metrics WHERE organization_id = 'tenant1' "
        f"AND TO_DATE('{end:%Y-%m-%d %H:%M:%S}') - d > 3 ORDER BY feature"
    ))
    assert [g[0] for g in got] == ["A", "B"]


def test_date_subtraction_long_to_decimal(engine, date_table):
    # DateTimeIT.java:1722 — (date - date) - 1.5 stays DECIMAL
    end = DATE_FIXTURE_START + timedelta(days=9)
    got = rows(engine, (
        "SELECT feature FROM dt_metrics WHERE organization_id = 'tenant1' "
        f"AND TO_DATE('{end:%Y-%m-%d %H:%M:%S}') - d - 1.5 > 3 "
        "ORDER BY feature"
    ))
    assert [g[0] for g in got] == ["A", "B", "C"]


def test_date_subtraction_compare_date(engine, date_table):
    # DateTimeIT.java:1750 — date - 1 is one DAY earlier
    end = DATE_FIXTURE_START + timedelta(days=9)
    got = rows(engine, (
        "SELECT feature FROM dt_metrics WHERE organization_id = 'tenant1' "
        f"AND d - 1 >= TO_DATE('{end:%Y-%m-%d %H:%M:%S}') ORDER BY feature"
    ))
    assert [g[0] for g in got] == ["F"]


def test_date_add_compare_date(engine, date_table):
    # DateTimeIT.java:1774
    end = DATE_FIXTURE_START + timedelta(days=8)
    got = rows(engine, (
        "SELECT feature FROM dt_metrics WHERE organization_id = 'tenant1' "
        f"AND d + 1 >= TO_DATE('{end:%Y-%m-%d %H:%M:%S}') ORDER BY feature"
    ))
    assert [g[0] for g in got] == ["E", "F"]


def test_cast_timestamp_to_date(engine):
    # DateTimeIT.java:1843 — CAST(ts AS DATE) keeps the Phoenix DATE type's
    # ms resolution: the day is preserved and renders date-first
    got = one(engine, (
        "SELECT CAST(TO_TIMESTAMP('2024-05-05 10:11:12.345') AS DATE) AS v"
    ))
    assert str(got).startswith("2024-05-05")


def test_current_date_and_now(engine, date_table):
    # DateTimeIT.java:776/:921/:1799 adapted to the fixed fixture epoch:
    # now()/current_date() must be "now" — every fixture date (2024) is in
    # the past, and the difference in days is a number.
    assert one(engine, (
        "SELECT count(*) AS v FROM dt_metrics WHERE now() > d"
    )) == 6
    assert one(engine, (
        "SELECT count(*) AS v FROM dt_metrics "
        "WHERE current_date() - d > 8"
    )) == 6
    v = one(engine, "SELECT CURRENT_DATE() AS v")
    assert v.year >= 2026
