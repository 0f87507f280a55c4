"""Numeric/math function surface (SURVEY.md §2.8 "Functions (Numeric)/(Math)").

Reference: JavaMathOneArgumentFunction subclasses (SqrtFunction, ExpFunction,
LnFunction, CbrtFunction, ...), RoundDecimalExpression / FloorFunction /
CeilFunction, AbsFunction, SignFunction, ModulusExpression in
phoenix-core-client/.../expression/function/.

Determinism notes (the hash compare is exact on doubles):
  * ROUND runs on DECIMAL inputs — decimal HALF_UP rounding is exact and
    identical on both engines; rounding raw doubles would hit representation
    edge cases.
  * TRUNC-to-integer on the positive price domain = FLOOR (Phoenix TruncFunction
    delegates to floor semantics for numbers; scale-ful TRUNC is covered on the
    decimal path).
  * sqrt is IEEE-754 correctly rounded → bit-identical across libm/JVM.
    exp/ln/cbrt/power are NOT correctly-rounded-guaranteed, so their outputs
    are rounded to 6 decimals before hashing (1-ulp libm drift vanishes; run
    on the 100-row supplier table to keep boundary risk negligible).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from phoenix_spark.queries._util import Registry, dec, t

REG = Registry()

REG.add(
    "math_round_floor_ceil",
    lambda spark, sf: t(spark, sf, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.round(dec("l_extendedprice"), 1).cast("double").alias("price_r1"),
        F.round(dec("l_extendedprice"), 0).cast("double").alias("price_r0"),
        # Scaling by 0.001 as a decimal *multiply*: decimal division would
        # degrade to DOUBLE in DuckDB (lossy), multiplication is exact in both.
        F.round(dec("l_extendedprice") * F.lit(0.001).cast("decimal(4,3)"), 2)
        .cast("double")
        .alias("price_k"),
        F.ceil("l_extendedprice").cast("long").alias("price_ceil"),
        F.floor("l_extendedprice").cast("long").alias("price_floor"),
        F.floor("l_extendedprice").cast("long").alias("price_trunc"),
        F.abs(F.col("l_discount") - 0.05).cast("double").alias("disc_dev"),
        F.signum(F.col("l_discount") - 0.05).cast("double").alias("disc_sign"),
        F.pmod(F.col("l_orderkey"), F.lit(7)).cast("long").alias("key_mod"),
    ),
    """
    SELECT l_orderkey, l_linenumber,
           CAST(round(CAST(l_extendedprice AS DECIMAL(18,2)), 1) AS DOUBLE) AS price_r1,
           CAST(round(CAST(l_extendedprice AS DECIMAL(18,2)), 0) AS DOUBLE) AS price_r0,
           CAST(round(CAST(l_extendedprice AS DECIMAL(18,2))
                      * CAST(0.001 AS DECIMAL(4,3)), 2) AS DOUBLE)          AS price_k,
           CAST(ceil(l_extendedprice) AS BIGINT)                            AS price_ceil,
           CAST(floor(l_extendedprice) AS BIGINT)                           AS price_floor,
           CAST(trunc(l_extendedprice) AS BIGINT)                           AS price_trunc,
           CAST(abs(l_discount - 0.05) AS DOUBLE)                           AS disc_dev,
           CAST(sign(l_discount - 0.05) AS DOUBLE)                          AS disc_sign,
           l_orderkey % 7                                                   AS key_mod
    FROM lineitem
    """,
)

REG.add(
    "math_transcendental",
    lambda spark, sf: t(spark, sf, "supplier").select(
        "s_suppkey",
        F.sqrt(F.abs("s_acctbal")).alias("bal_sqrt"),
        F.round(F.exp(F.col("s_suppkey") / F.lit(100.0)), 6).alias("key_exp"),
        F.round(F.log(F.abs(F.col("s_acctbal")) + F.lit(1.0)), 6).alias("bal_ln"),
        F.round(F.cbrt(F.abs("s_acctbal")), 6).alias("bal_cbrt"),
        F.round(F.pow(F.col("s_nationkey").cast("double"), F.lit(2.5)), 6).alias(
            "nk_pow"
        ),
        F.round(F.lit(3.141592653589793) * F.col("s_nationkey"), 6).alias("nk_pi"),
    ),
    """
    SELECT s_suppkey,
           sqrt(abs(s_acctbal))                                AS bal_sqrt,
           round(exp(s_suppkey / 100.0), 6)                    AS key_exp,
           round(ln(abs(s_acctbal) + 1.0), 6)                  AS bal_ln,
           round(cbrt(abs(s_acctbal)), 6)                      AS bal_cbrt,
           round(power(CAST(s_nationkey AS DOUBLE), 2.5), 6)   AS nk_pow,
           round(pi() * s_nationkey, 6)                        AS nk_pi
    FROM supplier
    """,
)

# --- trigonometry (post-doc reference functions SinFunction.java /
# CosFunction.java / TanFunction.java over JavaMathOneArgumentFunction.java,
# plus MathPIFunction.java; not yet in docs/phoenix.csv).  Doubles are pinned
# at 6 decimals — the same libm-ulp discipline as math_transcendental. --------
REG.add(
    "math_trig",
    lambda spark, sf: t(spark, sf, "supplier").select(
        "s_suppkey",
        F.round(F.sin(F.col("s_suppkey") / F.lit(10.0)), 6).alias("k_sin"),
        F.round(F.cos(F.col("s_suppkey") / F.lit(10.0)), 6).alias("k_cos"),
        F.round(F.tan(F.col("s_nationkey") / F.lit(25.0)), 6).alias("nk_tan"),
        F.round(F.atan(F.col("s_nationkey").cast("double")), 6).alias("nk_atan"),
        F.round(
            F.atan2(F.col("s_nationkey").cast("double"), F.lit(2.0)), 6
        ).alias("nk_atan2"),
        F.round(F.degrees(F.asin(F.lit(0.5))), 6).alias("asin_deg"),
        F.round(F.acos(F.lit(-1.0)), 6).alias("acos_pi"),
    ),
    """
    SELECT s_suppkey,
           round(sin(s_suppkey / 10.0), 6)                      AS k_sin,
           round(cos(s_suppkey / 10.0), 6)                      AS k_cos,
           round(tan(s_nationkey / 25.0), 6)                    AS nk_tan,
           round(atan(CAST(s_nationkey AS DOUBLE)), 6)          AS nk_atan,
           round(atan2(CAST(s_nationkey AS DOUBLE), 2.0), 6)    AS nk_atan2,
           round(degrees(asin(0.5)), 6)                         AS asin_deg,
           round(acos(-1.0), 6)                                 AS acos_pi
    FROM supplier
    """,
)

# --- TO_NUMBER (ToNumberFunction.java: string → numeric) ---------------------
REG.add(
    "math_to_number",
    lambda spark, sf: t(spark, sf, "customer").select(
        "c_custkey",
        F.col("c_custkey").cast("string").cast("double").alias("key_num"),
        F.regexp_extract("c_name", "[0-9]+", 0).cast("long").alias("name_num"),
    ),
    """
    SELECT c_custkey,
           CAST(CAST(c_custkey AS VARCHAR) AS DOUBLE)          AS key_num,
           CAST(regexp_extract(c_name, '[0-9]+') AS BIGINT)    AS name_num
    FROM customer
    """,
)


# --- TO_NUMBER / TO_CHAR with java.text.DecimalFormat patterns ---------------
# Reference: ToNumberFunction.java / ToCharFunction.java (both delegate to
# java.text.DecimalFormat).  The front-end translation
# (sqlfront.to_number_expr / to_char_numeric_expr) widens the integer part,
# handles sign and currency prefixes explicitly, and rounds HALF_EVEN via
# bround — verified against real DecimalFormat outputs (see
# tests/test_sqlfront_properties.py).  Round-trip over c_acctbal (which
# includes negatives): format '#,##0.00' -> parse back, and format with a
# currency prefix.  DuckDB's format('{:,.2f}') groups and rounds HALF_EVEN
# exactly like DecimalFormat, giving a textual oracle for the formatter.
def _to_number_fmt(spark, sf):
    from phoenix_spark.sqlfront import to_char_numeric_expr, to_number_expr

    parse_back = to_number_expr("format_number(c_acctbal, 2)", "#,##0.00")
    fmt_cur = to_char_numeric_expr("c_acctbal", "$#,##0.00")
    return t(spark, sf, "customer").select(
        "c_custkey",
        F.expr(parse_back).alias("parsed_back"),
        F.expr(fmt_cur).alias("formatted"),
    )


# DuckDB can't group floats in format(); build '#,##0.00' from the grouped
# INTEGER part (format('{:,}') groups integers) + zero-padded cents.
REG.add(
    "math_to_number_fmt",
    _to_number_fmt,
    """
    WITH v AS (
      SELECT c_custkey,
             CAST(round_even(c_acctbal, 2) AS DECIMAL(18,2)) AS d
      FROM customer
    )
    SELECT c_custkey,
           CAST(d AS DOUBLE) AS parsed_back,
           (CASE WHEN d < 0 THEN '-' ELSE '' END) || '$'
             || format('{:,}', CAST(floor(abs(d)) AS BIGINT)) || '.'
             || lpad(CAST(CAST(abs(d) * 100 AS BIGINT) % 100 AS VARCHAR), 2, '0')
             AS formatted
    FROM v
    """,
)
