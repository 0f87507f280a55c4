"""Date/time function surface (SURVEY.md §2.8 "Functions (Time and Date)").

Reference: YearFunction/MonthFunction/WeekFunction/DayOfWeekFunction/... and
RoundDateExpression / TruncFunction / ToCharFunction / ToDateFunction /
ConvertTimezoneFunction under phoenix-core-client/.../expression/function/.

Conventions pinned (the SURVEY-flagged traps):
  * Phoenix DATE carries time (PDate is ms-epoch date+time) → everything here
    is TimestampType; DATE arithmetic keeps the time component (`ts +
    INTERVAL n DAYS`, NOT Spark's date_add which truncates to DateType).
  * DAYOFWEEK is ISO Monday=1..Sunday=7 (DayOfWeekFunction.java:66 uses Joda
    getDayOfWeek) → Spark `weekday(ts) + 1`, DuckDB `isodow(ts)`.
  * WEEK is ISO week-of-year → Spark `weekofyear`, DuckDB `week`.
  * ROUND(date, 'HOUR') rounds half-up to the nearest unit
    (RoundDateExpression.java) — computed in exact integer epoch arithmetic
    on both engines; TRUNC(date, unit) → date_trunc.
  * TO_CHAR / TO_DATE format dialects: Phoenix uses java.text patterns, Spark
    uses its own, DuckDB uses strftime — the *pattern text* differs per
    engine but the pinned output is identical.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from phoenix_spark.queries._util import Registry, t

REG = Registry()

REG.add(
    "dt_extract_fields",
    lambda spark, sf: t(spark, sf, "orders").select(
        "o_orderkey",
        F.year("o_orderdate").cast("int").alias("y"),
        F.month("o_orderdate").cast("int").alias("mo"),
        F.dayofmonth("o_orderdate").cast("int").alias("d"),
        F.hour("o_orderdate").cast("int").alias("h"),
        F.minute("o_orderdate").cast("int").alias("mi"),
        F.second("o_orderdate").cast("int").alias("s"),
        F.dayofyear("o_orderdate").cast("int").alias("doy"),
        F.weekofyear("o_orderdate").cast("int").alias("wk"),
        (F.weekday("o_orderdate") + 1).cast("int").alias("dow"),
    ),
    """
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INT)       AS y,
           CAST(month(o_orderdate) AS INT)      AS mo,
           CAST(day(o_orderdate) AS INT)        AS d,
           CAST(hour(o_orderdate) AS INT)       AS h,
           CAST(minute(o_orderdate) AS INT)     AS mi,
           CAST(second(o_orderdate) AS INT)     AS s,
           CAST(dayofyear(o_orderdate) AS INT)  AS doy,
           CAST(week(o_orderdate) AS INT)       AS wk,
           CAST(isodow(o_orderdate) AS INT)     AS dow
    FROM orders
    """,
)

# --- TRUNC / ROUND on dates (RoundDateExpression, TruncFunction) -------------
# ROUND-to-hour in exact integer epoch-second arithmetic (half-up), identical
# on both engines; TRUNC via date_trunc.
REG.add(
    "dt_trunc_round",
    # All four columns are pure NTZ *field* arithmetic — no LTZ round-trip.
    # (date_trunc / unix_micros cast NTZ through the session zone, which
    # breaks across DST gaps when the driver's system TZ isn't UTC; field
    # extraction + make_timestamp_ntz is timezone-independent.)
    lambda spark, sf: t(spark, sf, "events").select(
        "event_id",
        F.expr(
            "make_timestamp_ntz(year(ts), month(ts), day(ts), hour(ts), 0, 0)"
        ).alias("ts_trunc_h"),
        F.expr(
            "make_timestamp_ntz(year(ts), month(ts), day(ts), 0, 0, 0)"
        ).alias("ts_trunc_d"),
        F.expr(
            "make_timestamp_ntz(year(ts), month(ts), 1, 0, 0, 0)"
        ).alias("ts_trunc_mo"),
        # half-up round-to-hour: minute>=30 is exactly floor((s+1800)/3600)
        # on the second-of-hour (sub-second parts can't cross the boundary)
        F.expr(
            "make_timestamp_ntz(year(ts), month(ts), day(ts), hour(ts), 0, 0)"
            " + IF(minute(ts) >= 30, INTERVAL 1 HOUR, INTERVAL 0 HOUR)"
        ).alias("ts_round_h"),
    ),
    """
    SELECT event_id,
           date_trunc('hour', ts)   AS ts_trunc_h,
           date_trunc('day', ts)    AS ts_trunc_d,
           date_trunc('month', ts)  AS ts_trunc_mo,
           date_trunc('hour', ts)
             + CASE WHEN minute(ts) >= 30 THEN INTERVAL 1 HOUR
                    ELSE INTERVAL 0 HOUR END
                                    AS ts_round_h
    FROM events
    """,
)

# --- TO_CHAR / date arithmetic / CONVERT_TZ ----------------------------------
REG.add(
    "dt_format_arith_tz",
    lambda spark, sf: t(spark, sf, "orders").select(
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd HH:mm").alias("ch"),
        F.date_format("o_orderdate", "yyyy/MM").alias("ch_ym"),
        (F.col("o_orderdate") + F.expr("INTERVAL 3 DAYS")).alias("plus3d"),
        (F.col("o_orderdate") - F.expr("INTERVAL 90 MINUTES")).alias("minus90m"),
        # convert_timezone with an EXPLICIT source zone: from_utc_timestamp
        # would interpret the NTZ input in the session zone (driver-TZ
        # dependent); this is pure wall-time → wall-time, NTZ in, NTZ out
        F.convert_timezone(
            F.lit("UTC"), F.lit("America/New_York"), F.col("o_orderdate")
        ).alias("ny_time"),
    ),
    """
    SELECT o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d %H:%M')  AS ch,
           strftime(o_orderdate, '%Y/%m')           AS ch_ym,
           o_orderdate + INTERVAL 3 DAY             AS plus3d,
           o_orderdate - INTERVAL 90 MINUTE         AS minus90m,
           timezone('America/New_York', timezone('UTC', o_orderdate)) AS ny_time
    FROM orders
    """,
)

# --- TO_DATE / TO_TIMESTAMP string parsing (ToDateFunction.java) -------------
# Round-trip: format a timestamp to a Phoenix-style string and parse it back;
# also parse a constant in a non-ISO pattern.
REG.add(
    "dt_parse",
    lambda spark, sf: t(spark, sf, "orders")
    .select(
        "o_orderkey",
        F.to_timestamp(
            F.date_format("o_orderdate", "MM/dd/yyyy HH:mm:ss"), "MM/dd/yyyy HH:mm:ss"
        )
        .cast("timestamp_ntz")
        .alias("roundtrip"),
        F.to_timestamp(F.lit("07/04/1996"), "MM/dd/yyyy")
        .cast("timestamp_ntz")
        .alias("fixed"),
    ),
    """
    SELECT o_orderkey,
           strptime(strftime(o_orderdate, '%m/%d/%Y %H:%M:%S'),
                    '%m/%d/%Y %H:%M:%S')            AS roundtrip,
           strptime('07/04/1996', '%m/%d/%Y')       AS fixed
    FROM orders
    """,
)


# --- WEEK/DAYOFWEEK numbering + datetime↔numeric casts through the SQL
# front-end (round 7, DateTimeIT/CastAndCoerceIT replays) ---------------------
def _dt_week_dayofweek(spark, sf):
    """DateTimeIT.testWeekFuncAgainstColumns/:719 + testDayOfWeek:859
    numbering through Engine.sql: WEEK is ISO week-of-year, DAYOFWEEK is
    ISO Monday=1 (DayOfWeekFunction.java:66) — both pure JVM field
    extractions, fully pushdown-friendly."""
    import tempfile

    from phoenix_spark.engine import Engine

    e = Engine(spark, sf_dir=sf, warehouse=tempfile.mkdtemp(prefix="phx_wh_"))
    return e.sql(
        "SELECT WEEK(o_orderdate) AS wk, DAYOFWEEK(o_orderdate) AS dow, "
        "DAYOFYEAR(o_orderdate) AS doy, COUNT(*) AS cnt "
        "FROM orders GROUP BY WEEK(o_orderdate), DAYOFWEEK(o_orderdate), "
        "DAYOFYEAR(o_orderdate)"
    )


REG.add(
    "dt_week_dayofweek",
    _dt_week_dayofweek,
    """
    SELECT CAST(weekofyear(o_orderdate) AS INT) AS wk,
           CAST(isodow(o_orderdate) AS INT) AS dow,
           CAST(dayofyear(o_orderdate) AS INT) AS doy,
           COUNT(*) AS cnt
    FROM orders
    GROUP BY 1, 2, 3
    """,
)


def _cast_coerce_matrix(spark, sf):
    """CastAndCoerceIT.testCoerceDateToBigInt:200 through Engine.sql:
    Phoenix DATE holds epoch MILLIS, so CAST(date AS BIGINT) is the ms
    count (PDateCodec) and the BIGINT→DATE round-trip restores the
    instant; Spark's native second-based casts are rewritten by
    sqlfront._rewrite_datetime_casts."""
    import tempfile

    from phoenix_spark.engine import Engine

    e = Engine(spark, sf_dir=sf, warehouse=tempfile.mkdtemp(prefix="phx_wh_"))
    return e.sql(
        "SELECT o_orderkey, CAST(o_orderdate AS BIGINT) AS ms, "
        "CAST(CAST(o_orderdate AS BIGINT) AS DATE) AS rt "
        "FROM orders WHERE o_orderkey <= 1000"
    )


REG.add(
    "cast_coerce_matrix",
    _cast_coerce_matrix,
    """
    SELECT o_orderkey, epoch_ms(o_orderdate) AS ms, o_orderdate AS rt
    FROM orders WHERE o_orderkey <= 1000
    """,
)
