"""Projection / filter / predicate surface (SURVEY.md §2.2).

Reference compilers: WhereCompiler (.../compile/WhereCompiler.java),
WhereOptimizer (predicate→key-range pushdown), expression nodes under
.../expression/ (ComparisonExpression, InListExpression, LikeExpression,
IsNullExpression, CaseExpression, CoerceExpression,
RowValueConstructorExpression).  Spark: Catalyst pushes these to the
parquet scan; the queries pin the 3-valued-logic / LIKE / RVC semantics.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from phoenix_spark.queries._util import Registry, t, views

REG = Registry()

# --- comparison + BETWEEN + equality, pushed to scan -----------------------
REG.add(
    "filter_range_pred",
    lambda spark, sf: t(spark, sf, "lineitem")
    .filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_quantity") < 25)
        & (F.col("l_returnflag") == "R")
    )
    .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"),
    """
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_quantity < 25 AND l_returnflag = 'R'
    """,
)

# --- IN list + LIKE + OR ---------------------------------------------------
REG.add(
    "filter_in_like",
    lambda spark, sf: t(spark, sf, "part")
    .filter(
        F.col("p_name").like("%widget%")
        | F.col("p_brand").isin("Brand#1", "Brand#7", "Brand#23")
    )
    .select("p_partkey", "p_name", "p_brand"),
    """
    SELECT p_partkey, p_name, p_brand FROM part
    WHERE p_name LIKE '%widget%' OR p_brand IN ('Brand#1', 'Brand#7', 'Brand#23')
    """,
)

# --- ILIKE (grammar :1077-1099) + NOT LIKE ---------------------------------
REG.add(
    "filter_ilike",
    lambda spark, sf: t(spark, sf, "part")
    .filter(F.col("p_name").ilike("%WIDGET%") & ~F.col("p_type").like("PRO%"))
    .select("p_partkey", "p_name", "p_type"),
    """
    SELECT p_partkey, p_name, p_type FROM part
    WHERE p_name ILIKE '%WIDGET%' AND p_type NOT LIKE 'PRO%'
    """,
)

# --- IS NULL / 3-valued logic (AndExpression/OrExpression/NotExpression) ---
# The fixtures have no NULLs, so manufacture them with NULLIF-style CASE:
# negative balances become NULL, then exercise NULL-propagating predicates.
REG.add(
    "filter_null_3vl",
    lambda spark, sf: t(spark, sf, "customer")
    .withColumn(
        "bal", F.when(F.col("c_acctbal") < 0, F.lit(None)).otherwise(F.col("c_acctbal"))
    )
    .filter(F.col("bal").isNull() | ((F.col("bal") > 9000) & ~(F.col("c_nationkey") < 3)))
    .select("c_custkey", F.col("bal").cast("double").alias("bal")),
    """
    SELECT c_custkey, CAST(bal AS DOUBLE) AS bal FROM (
      SELECT c_custkey, c_nationkey,
             CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END AS bal
      FROM customer) x
    WHERE bal IS NULL OR (bal > 9000 AND NOT (c_nationkey < 3))
    """,
)

# --- row value constructor comparison (grammar :1188-1196) -----------------
# Reference: RowValueConstructorExpression.java.  Spark struct comparisons
# are native and match tuple ordering semantics.
REG.add(
    "filter_rvc_compare",
    lambda spark, sf: t(spark, sf, "lineitem")
    .filter(
        F.struct("l_orderkey", "l_linenumber")
        > F.struct(F.lit(14000).cast("long").alias("l_orderkey"),
                   F.lit(2).cast("int").alias("l_linenumber"))
    )
    .select("l_orderkey", "l_linenumber", "l_quantity"),
    """
    SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
    WHERE (l_orderkey, l_linenumber) > (14000, 2)
    """,
)

# --- RVC IN (point list over composite PK) ---------------------------------
# Spark 4 does not coerce struct-vs-struct element types in IN, so the
# literal tuples carry explicit casts matching the column types.
def _rvc_in(spark, sf):
    views(spark, sf)
    return spark.sql(
        """
        SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        WHERE (l_orderkey, l_linenumber) IN
              ((CAST(11 AS BIGINT), CAST(3 AS INT)),
               (CAST(308 AS BIGINT), CAST(1 AS INT)),
               (CAST(1042 AS BIGINT), CAST(3 AS INT)),
               (CAST(1042 AS BIGINT), CAST(4 AS INT)))
        """
    )


REG.add(
    "filter_rvc_in",
    _rvc_in,
    """
    SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
    WHERE (l_orderkey, l_linenumber) IN ((11, 3), (308, 1), (1042, 3), (1042, 4))
    """,
)

# --- CASE / CAST / COALESCE (CaseExpression, CoerceExpression) -------------
REG.add(
    "filter_case_cast",
    lambda spark, sf: t(spark, sf, "orders").select(
        "o_orderkey",
        F.when(F.col("o_orderstatus") == "F", "finished")
        .when(F.col("o_orderstatus") == "O", "open")
        .otherwise("other")
        .alias("status_word"),
        F.col("o_totalprice").cast("decimal(18,2)").cast("string").alias("price_str"),
        F.coalesce(
            F.when(F.col("o_totalprice") > 150000, F.col("o_orderpriority")),
            F.lit("n/a"),
        ).alias("prio_or_na"),
        F.col("o_orderkey").cast("int").cast("double").alias("key_dbl"),
    ),
    """
    SELECT o_orderkey,
           CASE o_orderstatus WHEN 'F' THEN 'finished' WHEN 'O' THEN 'open'
                ELSE 'other' END AS status_word,
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR) AS price_str,
           COALESCE(CASE WHEN o_totalprice > 150000 THEN o_orderpriority END, 'n/a')
             AS prio_or_na,
           CAST(CAST(o_orderkey AS INTEGER) AS DOUBLE) AS key_dbl
    FROM orders
    """,
)


# --- LIKE with ESCAPE (SURVEY §7 hard-part 8) ---------------------------------
# Phoenix LikeExpression treats \ as the escape for literal %/_; Spark and
# DuckDB both take an explicit ESCAPE clause, which sidesteps the engines'
# different string-literal backslash parsing.  The fixture's n_name values
# are the synthetic 'NATION_<k>' (see FIXTURES.md), so after even-keyed rows
# get their underscore replaced with 'X' ('NATIONX<k>') the two predicates
# genuinely diverge: `wild` ('_' = any char) matches 'NATION_<k>' AND
# 'NATIONX<k>' alike (stays true for every row), while `esc` (escaped
# literal underscore) is true only where the '_' survived.
def _like_escape(spark, sf):
    n = t(spark, sf, "nation").select(
        "n_nationkey",
        F.expr(
            "CASE WHEN n_nationkey % 2 = 0 THEN replace(n_name, '_', 'X')"
            " ELSE n_name END"
        ).alias("u"),
    )
    return n.select(
        "n_nationkey",
        "u",
        F.expr("u LIKE '%!_%' ESCAPE '!'").alias("esc"),
        F.expr("u LIKE 'NATION_%'").alias("wild"),
    )


REG.add(
    "filter_like_escape",
    _like_escape,
    """
    SELECT n_nationkey, u,
           u LIKE '%!_%' ESCAPE '!'  AS esc,
           u LIKE 'NATION_%'         AS wild
    FROM (
      SELECT n_nationkey,
             CASE WHEN n_nationkey % 2 = 0 THEN replace(n_name, '_', 'X')
                  ELSE n_name END AS u
      FROM nation
    ) s
    """,
)


# --- FLOAT-column literal comparison coercion (§2.2) -------------------------
# Phoenix coerces comparison literals to the COLUMN's type (WhereCompiler via
# ComparisonExpression/PFloat coercion; NotQueryIT.testNotInListOfFloat), so
# ``f = 0.01`` over a FLOAT column compares at FLOAT precision and matches the
# stored 0.01f.  Spark/DuckDB instead promote the float column to double,
# where float(0.01) != 0.01d — sqlfront._rewrite_float_literal_cmp casts the
# literal side so the plan keeps the column pushdown-able.
def _float_literal_cmp(spark, sf):
    import tempfile

    from phoenix_spark.engine import Engine

    e = Engine(spark, sf_dir=sf, warehouse=tempfile.mkdtemp(prefix="phx_wh_"))
    e.sql(
        "CREATE TABLE t_flt (k BIGINT NOT NULL, f FLOAT, "
        "CONSTRAINT pk PRIMARY KEY (k))"
    )
    e.sql(
        "UPSERT INTO t_flt SELECT o_orderkey, CAST(o_totalprice AS FLOAT) "
        "FROM orders WHERE o_orderkey <= 2000"
    )
    # 0.01 / 143.21 are NOT exactly representable in binary — the equality
    # only matches when the literal is coerced to FLOAT like Phoenix does
    e.sql(
        "UPSERT INTO t_flt VALUES (9000001, 0.01), (9000002, 0.015), "
        "(9000003, 143.21)"
    )
    return e.sql(
        "SELECT k, CAST(f AS DOUBLE) AS f FROM t_flt "
        "WHERE f = 0.01 OR f = 143.21 OR f BETWEEN 50000.0 AND 60000.0"
    )


REG.add(
    "filter_float_literal_cmp",
    _float_literal_cmp,
    """
    WITH t AS (
      SELECT o_orderkey AS k, CAST(o_totalprice AS REAL) AS f
      FROM orders WHERE o_orderkey <= 2000
      UNION ALL
      SELECT * FROM (VALUES (CAST(9000001 AS BIGINT), CAST(0.01 AS REAL)),
                            (9000002, CAST(0.015 AS REAL)),
                            (9000003, CAST(143.21 AS REAL))) AS v(k, f)
    )
    SELECT k, CAST(f AS DOUBLE) AS f FROM t
    WHERE f = CAST(0.01 AS REAL) OR f = CAST(143.21 AS REAL)
       OR f BETWEEN 50000.0 AND 60000.0
    """,
)
