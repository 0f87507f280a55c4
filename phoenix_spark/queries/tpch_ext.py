"""Full TPC-H shape coverage beyond the Q1/Q3/Q5/Q6/Q10/Q12/Q14 entries in
joins.py — the remaining fifteen query shapes (Q2, Q4, Q7, Q8, Q9, Q11, Q13,
Q15..Q22), each adapted to the driver fixture schema.

The fixtures are a trimmed TPC-H (TESTDATA.md): there is **no partsupp
table** and no l_commitdate / l_receiptdate / comment / phone / container
columns.  Queries that need them are *adapted*, preserving the plan shape
the reference exercises (the point of parity: correlated aggregates,
multi-EXISTS decorrelation, scalar-subquery thresholds, OR-disjunct
predicate pushdown — the shapes Phoenix's SubqueryRewriter.java /
JoinCompiler.java compile):

  * part↔supplier linkage is derived from lineitem (distinct l_partkey,
    l_suppkey) wherever partsupp is required (Q2, Q9, Q11, Q16, Q20).
  * "late shipment" (Q4, Q21) is l_shipdate > o_orderdate + 60 days, a
    proxy for l_receiptdate > l_commitdate.
  * Q22's phone country code becomes a customer-name suffix digit.

Reference provenance (shapes, not code): the corresponding subquery rewrite
paths live in phoenix-core-client/src/main/java/org/apache/phoenix/compile/
SubqueryRewriter.java (IN / EXISTS / correlated → semi/anti join) and
JoinCompiler.java; Phoenix's own join ITs (HashJoinIT.java,
SortMergeJoinIT.java, SubqueryIT.java) test these same shapes.

Scale notes (100 TB design): every subquery here decorrelates to a
broadcast or shuffle hash join — no per-row re-execution.  Scalar-subquery
thresholds (Q11, Q15, Q22) are 1-row broadcast cross joins; correlated
aggregates (Q2, Q17, Q21) become window/groupBy aggregations shuffled once
on the correlation key.  Determinism follows _util's exact-decimal rules.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from phoenix_spark.queries._util import Registry, d12, dec, t

REG = Registry()

def _one():
    # Built lazily: F.lit at module import time would require a live
    # SparkContext before any session exists.
    return F.lit(1).cast("decimal(12,2)")


def _ts(s: str):
    return F.lit(s).cast("timestamp")


def _volume():
    """Exact-decimal revenue term: extendedprice * (1 - discount)."""
    return d12("l_extendedprice") * (_one() - d12("l_discount"))


_VOLUME_SQL = (
    "CAST(l_extendedprice AS DECIMAL(12,2)) * "
    "(CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))"
)


# --- Q2 shape: min-cost supplier (correlated MIN subquery) -------------------
# Adapted: the part↔supplier link is DISTINCT (l_partkey, l_suppkey) from
# lineitem, and the minimised "cost" is s_acctbal.  The correlated
# `s_acctbal = (SELECT MIN(..) .. WHERE l2.l_partkey = p_partkey ..)`
# decorrelates to a window MIN over the candidate set partitioned by
# p_partkey — the inner query's constraints (region + ship link) equal the
# outer's, so one shuffle on p_partkey replaces per-row re-execution.
def _q2(spark, sf):
    link = (
        t(spark, sf, "lineitem").select("l_partkey", "l_suppkey").distinct()
    )
    part = t(spark, sf, "part").filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "STANDARD")
    )
    supp = t(spark, sf, "supplier")
    nation = t(spark, sf, "nation")
    region = t(spark, sf, "region").filter(F.col("r_name") == "EUROPE")
    cand = (
        link.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    w = Window.partitionBy("p_partkey")
    return (
        cand.withColumn("min_bal", F.min("s_acctbal").over(w))
        .filter(F.col("s_acctbal") == F.col("min_bal"))
        .select(
            F.col("s_acctbal").cast("double").alias("s_acctbal"),
            "s_name",
            "n_name",
            "p_partkey",
            "p_brand",
            "s_suppkey",
        )
        .orderBy(
            F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey", "s_suppkey"
        )
        .limit(100)
    )


REG.add(
    "q2_min_cost_supplier",
    _q2,
    """
    WITH link AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
    SELECT CAST(s_acctbal AS DOUBLE) AS s_acctbal, s_name, n_name,
           p_partkey, p_brand, s_suppkey
    FROM link
    JOIN part     ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE p_size = 15 AND p_type = 'STANDARD' AND r_name = 'EUROPE'
      AND s_acctbal = (
        SELECT MIN(s2.s_acctbal)
        FROM link l2
        JOIN supplier s2 ON l2.l_suppkey = s2.s_suppkey
        JOIN nation n2   ON s2.s_nationkey = n2.n_nationkey
        JOIN region r2   ON n2.n_regionkey = r2.r_regionkey
        WHERE l2.l_partkey = p_partkey AND r2.r_name = 'EUROPE')
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey, s_suppkey
    LIMIT 100
    """,
)

# --- Q4 shape: order priority checking (EXISTS → semi join with residual) ----
# "Late" proxy: some line shipped more than 60 days after the order date.
# The correlated EXISTS carries a non-equi term (l_shipdate > o_orderdate +
# 60d) — Spark plans it as a left-semi hash join on l_orderkey with the date
# comparison as a residual join condition, exactly the SubqueryRewriter
# semi-join rewrite.
def _q4(spark, sf):
    orders = t(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-01-01"))
        & (F.col("o_orderdate") < _ts("1996-04-01"))
    )
    li = t(spark, sf, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        orders.join(
            li,
            (F.col("o_orderkey") == F.col("l_orderkey"))
            & (
                F.col("l_shipdate")
                > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
            ),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


REG.add(
    "q4_order_priority",
    _q4,
    """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1996-04-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)

# --- Q7 shape: volume shipping between two nations (6-way join, year agg) ----
def _q7(spark, sf):
    li = t(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1995-01-01"))
        & (F.col("l_shipdate") < _ts("1997-01-01"))
    )
    orders = t(spark, sf, "orders").select("o_orderkey", "o_custkey")
    cust = t(spark, sf, "customer").select("c_custkey", "c_nationkey")
    supp = t(spark, sf, "supplier").select("s_suppkey", "s_nationkey")
    n1 = t(spark, sf, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = t(spark, sf, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (F.col("supp_nation") == "NATION_1") & (
        F.col("cust_nation") == "NATION_2"
    ) | (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("cn_key"))
        .filter(pair)
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").cast("int").alias("l_year")
        )
        .agg(F.sum(_volume()).cast("double").alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


REG.add(
    "q7_nation_volume",
    _q7,
    f"""
    SELECT supp_nation, cust_nation, l_year,
           CAST(SUM(volume) AS DOUBLE) AS revenue
    FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                 CAST(year(l_shipdate) AS INT) AS l_year,
                 {_VOLUME_SQL} AS volume
          FROM lineitem
          JOIN orders   ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation n1 ON s_nationkey = n1.n_nationkey
          JOIN nation n2 ON c_nationkey = n2.n_nationkey
          WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
              OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
            AND l_shipdate >= TIMESTAMP '1995-01-01'
            AND l_shipdate <  TIMESTAMP '1997-01-01') shipping
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)

# --- Q8 shape: national market share (8-way join, conditional ratio) ---------
# Ratio of two exact decimal sums cast to double at the very end — one IEEE
# division, bit-identical on both engines.
def _q8(spark, sf):
    li = t(spark, sf, "lineitem")
    part = t(spark, sf, "part").filter(F.col("p_type") == "ECONOMY")
    orders = t(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= _ts("1995-01-01"))
        & (F.col("o_orderdate") < _ts("1997-01-01"))
    )
    cust = t(spark, sf, "customer").select("c_custkey", "c_nationkey")
    supp = t(spark, sf, "supplier").select("s_suppkey", "s_nationkey")
    n1 = t(spark, sf, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("c_region")
    )
    n2 = t(spark, sf, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("nation")
    )
    region = t(spark, sf, "region").filter(F.col("r_name") == "ASIA")
    vol = _volume()
    zero = F.lit(0).cast("decimal(25,4)")
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(region), F.col("c_region") == F.col("r_regionkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("sn_key"))
        .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            (
                F.sum(F.when(F.col("nation") == "NATION_5", vol).otherwise(zero))
                .cast("double")
                / F.sum(vol).cast("double")
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


REG.add(
    "q8_market_share",
    _q8,
    f"""
    SELECT o_year,
           CAST(SUM(CASE WHEN nation = 'NATION_5' THEN volume
                         ELSE CAST(0 AS DECIMAL(25,4)) END) AS DOUBLE)
           / CAST(SUM(volume) AS DOUBLE) AS mkt_share
    FROM (SELECT CAST(year(o_orderdate) AS INT) AS o_year,
                 {_VOLUME_SQL} AS volume,
                 n2.n_name AS nation
          FROM lineitem
          JOIN part     ON l_partkey = p_partkey
          JOIN orders   ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation n1 ON c_nationkey = n1.n_nationkey
          JOIN region   ON n1.n_regionkey = r_regionkey
          JOIN nation n2 ON s_nationkey = n2.n_nationkey
          WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
            AND o_orderdate >= TIMESTAMP '1995-01-01'
            AND o_orderdate <  TIMESTAMP '1997-01-01') all_nations
    GROUP BY o_year
    ORDER BY o_year
    """,
)

# --- Q13 shape: customer order-count distribution (outer join + double agg) --
# LEFT join keeps order-less customers (c_count = 0); the join predicate
# carries the priority filter so those customers still appear — the exact
# outer-join-with-residual shape Phoenix compiles in JoinCompiler.
def _q13(spark, sf):
    cust = t(spark, sf, "customer").select("c_custkey")
    orders = t(spark, sf, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    ).select("o_custkey", "o_orderkey")
    per_cust = (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


REG.add(
    "q13_customer_distribution",
    _q13,
    """
    SELECT c_count, COUNT(*) AS custdist
    FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
          FROM customer
          LEFT JOIN orders ON c_custkey = o_custkey
                          AND o_orderpriority <> '1-URGENT'
          GROUP BY c_custkey) c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)

# --- Q9 shape: product-type profit by nation and year (5-way join) ----------
# Adapted: without ps_supplycost, cost is modeled as 10% of p_retailprice per
# unit.  All terms exact decimal: (12,2)*(12,2) -> (25,4); the subtraction
# aligns scales exactly on both engines, so SUM bits match.
def _q9(spark, sf):
    li = t(spark, sf, "lineitem")
    part = t(spark, sf, "part").filter(F.col("p_name").contains("red"))
    supp = t(spark, sf, "supplier").select("s_suppkey", "s_nationkey")
    nation = t(spark, sf, "nation").select("n_nationkey", "n_name")
    orders = t(spark, sf, "orders").select("o_orderkey", "o_orderdate")
    tenth = F.lit("0.10").cast("decimal(12,2)")
    amount = _volume() - d12("p_retailprice") * tenth * d12("l_quantity")
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(F.sum(amount).cast("double").alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


REG.add(
    "q9_product_profit",
    _q9,
    f"""
    SELECT nation, o_year, CAST(SUM(amount) AS DOUBLE) AS sum_profit
    FROM (SELECT n_name AS nation,
                 CAST(year(o_orderdate) AS INT) AS o_year,
                 {_VOLUME_SQL}
                 - CAST(p_retailprice AS DECIMAL(12,2))
                   * CAST('0.10' AS DECIMAL(12,2))
                   * CAST(l_quantity AS DECIMAL(12,2)) AS amount
          FROM lineitem
          JOIN part     ON l_partkey = p_partkey
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation   ON s_nationkey = n_nationkey
          JOIN orders   ON l_orderkey = o_orderkey
          WHERE p_name LIKE '%red%') profit
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
)

# --- Q11 shape: important stock (group-by + scalar-subquery threshold) -------
# Adapted over the lineitem link: part "value" = shipped extendedprice from
# suppliers of one nation; HAVING value > 0.1% of the national total.  The
# scalar total is a 1-row broadcast cross join — computed once, not per
# group.  Threshold compare stays in exact decimal (0.001 multiplier is a
# DECIMAL(6,3) literal; decimal multiply is exact on both engines).
def _q11(spark, sf):
    li = t(spark, sf, "lineitem").select("l_partkey", "l_suppkey", "l_extendedprice")
    supp = t(spark, sf, "supplier").select("s_suppkey", "s_nationkey")
    nation = t(spark, sf, "nation").filter(F.col("n_name") == "NATION_3")
    base = li.join(
        F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey")
    ).join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
    per_part = base.groupBy("l_partkey").agg(
        F.sum(dec("l_extendedprice")).alias("val")
    )
    frac = F.lit("0.001").cast("decimal(6,3)")
    total = base.agg((F.sum(dec("l_extendedprice")) * frac).alias("threshold"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("val") > F.col("threshold"))
        .select("l_partkey", F.col("val").cast("double").alias("part_value"))
        .orderBy(F.col("part_value").desc(), "l_partkey")
    )


REG.add(
    "q11_important_stock",
    _q11,
    """
    SELECT l_partkey, CAST(val AS DOUBLE) AS part_value
    FROM (SELECT l_partkey, SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS val
          FROM lineitem
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation   ON s_nationkey = n_nationkey
          WHERE n_name = 'NATION_3'
          GROUP BY l_partkey) pv
    WHERE val > (SELECT SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
                        * CAST('0.001' AS DECIMAL(6,3))
                 FROM lineitem
                 JOIN supplier ON l_suppkey = s_suppkey
                 JOIN nation   ON s_nationkey = n_nationkey
                 WHERE n_name = 'NATION_3')
    ORDER BY part_value DESC, l_partkey
    """,
)

# --- Q15 shape: top supplier (aggregate view + scalar MAX equality) ----------
# Revenue stays decimal through the MAX-equality compare (exact); only the
# output column is cast to double.  The MAX scalar is a broadcast cross
# join, and supplier is the broadcast side of the final equi-join.
def _q15(spark, sf):
    rev = (
        t(spark, sf, "lineitem")
        .filter(
            (F.col("l_shipdate") >= _ts("1996-01-01"))
            & (F.col("l_shipdate") < _ts("1996-04-01"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(_volume()).alias("total_rev"))
    )
    top = rev.agg(F.max("total_rev").alias("max_rev"))
    return (
        rev.crossJoin(F.broadcast(top))
        .filter(F.col("total_rev") == F.col("max_rev"))
        .join(
            F.broadcast(t(spark, sf, "supplier")),
            F.col("supplier_no") == F.col("s_suppkey"),
        )
        .select(
            "s_suppkey",
            "s_name",
            F.col("total_rev").cast("double").alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


REG.add(
    "q15_top_supplier",
    _q15,
    f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no, SUM({_VOLUME_SQL}) AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_rev = (SELECT MAX(total_rev) FROM revenue)
    ORDER BY s_suppkey
    """,
)

# --- Q16 shape: parts/supplier relationship (NOT IN → anti join + distinct) --
# Adapted: the part↔supplier pairs come from lineitem; the NOT IN excludes
# negative-balance suppliers (s_suppkey is non-null, so NOT IN ≡ anti join).
def _q16(spark, sf):
    pairs = (
        t(spark, sf, "lineitem").select("l_partkey", "l_suppkey").distinct()
    )
    part = t(spark, sf, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35)
    )
    bad_supp = t(spark, sf, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    return (
        pairs.join(
            F.broadcast(bad_supp),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_size")
    )


REG.add(
    "q16_supplier_cnt",
    _q16,
    """
    SELECT p_brand, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) pairs
    JOIN part ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_size
    """,
)

# --- Q17 shape: small-quantity-order revenue (correlated AVG threshold) ------
# The correlated `l_quantity < 0.2 * AVG(l_quantity per part)` decorrelates
# to a groupBy-on-partkey aggregate broadcast back onto lineitem — one extra
# scan instead of a per-row subquery.  Quantities are small integers stored
# as double, so AVG = exact-sum/count and 0.2*avg are bit-identical on both
# engines.
def _q17(spark, sf):
    li = t(spark, sf, "lineitem")
    part = t(spark, sf, "part").filter(F.col("p_brand") == "Brand#3")
    per_part_avg = li.groupBy(F.col("l_partkey").alias("ap_key")).agg(
        F.avg("l_quantity").alias("avg_qty")
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(per_part_avg), F.col("l_partkey") == F.col("ap_key"))
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            (F.sum(dec("l_extendedprice")).cast("double") / 7.0).alias(
                "avg_yearly"
            )
        )
    )


REG.add(
    "q17_small_qty_revenue",
    _q17,
    """
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
           AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#3'
      AND l_quantity < (SELECT 0.2 * AVG(l2.l_quantity)
                        FROM lineitem l2
                        WHERE l2.l_partkey = p_partkey)
    """,
)

# --- Q18 shape: large-volume customers (IN over grouped HAVING) --------------
# The IN-subquery over an aggregate becomes a semi join against the grouped
# key set.  l_quantity is integer-valued, so SUM(double) is exact in any
# order on both engines; the 300 threshold and output sum hash-match.
def _q18(spark, sf):
    li = t(spark, sf, "lineitem")
    big = (
        li.groupBy(F.col("l_orderkey").alias("bk"))
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 300)
        .select("bk")
    )
    return (
        li.join(F.broadcast(big), F.col("l_orderkey") == F.col("bk"), "left_semi")
        .join(t(spark, sf, "orders"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(t(spark, sf, "customer")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum("l_quantity").cast("double").alias("total_qty"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_orderdate",
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
            "total_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderdate", "o_orderkey")
        .limit(100)
    )


REG.add(
    "q18_large_volume_customer",
    _q18,
    """
    SELECT c_custkey, c_name, o_orderkey, o_orderdate,
           CAST(o_totalprice AS DOUBLE) AS o_totalprice,
           CAST(SUM(l_quantity) AS DOUBLE) AS total_qty
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                         GROUP BY l_orderkey HAVING SUM(l_quantity) > 300)
    GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
    LIMIT 100
    """,
)

# --- Q19 shape: discounted revenue (OR-disjunct join predicate) --------------
# Three brand/size/quantity disjuncts — the shape that tests OR-predicate
# pushdown through a join (Phoenix pushes each disjunct's key range;
# Catalyst pushes the common l_quantity/p_size bounds and evaluates the OR
# as a residual after the broadcast join).
def _q19(spark, sf):
    li = t(spark, sf, "lineitem")
    part = t(spark, sf, "part")
    joined = li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    disj = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return joined.filter(disj).agg(
        F.sum(_volume()).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n"),
    )


REG.add(
    "q19_disjunct_revenue",
    _q19,
    f"""
    SELECT CAST(SUM({_VOLUME_SQL}) AS DOUBLE) AS revenue, COUNT(*) AS n
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 20 AND 30)
    """,
)

# --- Q20 shape: potential part promotion (nested IN subqueries) --------------
# Two stacked IN-subqueries (parts by name → shippers above a quantity
# threshold) plus a nation IN — all become semi joins; the grouped HAVING
# runs once, shuffled on l_suppkey.
def _q20(spark, sf):
    red_parts = t(spark, sf, "part").filter(
        F.col("p_name").startswith("red")
    ).select("p_partkey")
    shippers = (
        t(spark, sf, "lineitem")
        .filter(
            (F.col("l_shipdate") >= _ts("1996-01-01"))
            & (F.col("l_shipdate") < _ts("1997-01-01"))
        )
        .join(
            F.broadcast(red_parts),
            F.col("l_partkey") == F.col("p_partkey"),
            "left_semi",
        )
        .groupBy(F.col("l_suppkey").alias("sk"))
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 50)
        .select("sk")
    )
    nations = t(spark, sf, "nation").filter(
        F.col("n_name").isin("NATION_7", "NATION_8")
    ).select("n_nationkey")
    return (
        t(spark, sf, "supplier")
        .join(F.broadcast(shippers), F.col("s_suppkey") == F.col("sk"), "left_semi")
        .join(
            F.broadcast(nations),
            F.col("s_nationkey") == F.col("n_nationkey"),
            "left_semi",
        )
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


REG.add(
    "q20_part_promotion",
    _q20,
    """
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE s_suppkey IN (
        SELECT l_suppkey FROM lineitem
        WHERE l_partkey IN (SELECT p_partkey FROM part
                            WHERE p_name LIKE 'red%')
          AND l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1997-01-01'
        GROUP BY l_suppkey HAVING SUM(l_quantity) > 50)
      AND s_nationkey IN (SELECT n_nationkey FROM nation
                          WHERE n_name IN ('NATION_7', 'NATION_8'))
    ORDER BY s_suppkey
    """,
)

# --- Q21 shape: suppliers who kept orders waiting (EXISTS + NOT EXISTS) ------
# The double correlated subquery decorrelates to per-order aggregates: a
# late line survives iff its order has >= 2 distinct suppliers and exactly
# one distinct *late* supplier (itself).  One shuffle on l_orderkey replaces
# two correlated scans — the SubqueryRewriter semi/anti pattern fused into a
# single grouped pass.
def _q21(spark, sf):
    orders = t(spark, sf, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderstatus"
    )
    li = t(spark, sf, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    lo = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey")).withColumn(
        "late",
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"),
    )
    per_order = lo.groupBy(F.col("l_orderkey").alias("po_key")).agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(F.when(F.col("late"), F.col("l_suppkey"))).alias(
            "n_late_supp"
        ),
    )
    wait_nation = (
        t(spark, sf, "supplier")
        .join(
            F.broadcast(
                t(spark, sf, "nation").filter(F.col("n_name") == "NATION_4")
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name")
    )
    return (
        lo.filter(F.col("late") & (F.col("o_orderstatus") == "F"))
        .join(per_order, F.col("l_orderkey") == F.col("po_key"))
        .filter((F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1))
        .join(F.broadcast(wait_nation), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


REG.add(
    "q21_suppliers_waiting",
    _q21,
    """
    SELECT s_name, COUNT(*) AS numwait
    FROM supplier, lineitem l1, orders, nation
    WHERE s_suppkey = l1.l_suppkey
      AND o_orderkey = l1.l_orderkey
      AND o_orderstatus = 'F'
      AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
      AND s_nationkey = n_nationkey
      AND n_name = 'NATION_4'
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
)

# --- Q22 shape: global sales opportunity (scalar AVG + NOT EXISTS) -----------
# Adapted: "country code" is the last digit of c_name.  The AVG threshold is
# written as exact-decimal-SUM / COUNT — one IEEE division, identical bits —
# then broadcast; NOT EXISTS is a left-anti join on custkey.  Every fixture
# customer has at least one order, so the "no orders" test is scoped to the
# trailing window (>= 2001-01-01) to keep the anti join non-vacuous.
def _q22(spark, sf):
    cust = t(spark, sf, "customer").withColumn(
        "cntrycode", F.expr("substr(c_name, length(c_name), 1)")
    )
    eligible = cust.filter(F.col("cntrycode").isin("1", "3", "5", "7", "9"))
    thresh = eligible.filter(F.col("c_acctbal") > 0).agg(
        (
            F.sum(dec("c_acctbal")).cast("double") / F.count(F.lit(1))
        ).alias("avg_bal")
    )
    return (
        eligible.crossJoin(F.broadcast(thresh))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(
            t(spark, sf, "orders")
            .filter(F.col("o_orderdate") >= _ts("2001-01-01"))
            .select("o_custkey"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_anti",
        )
        .groupBy("cntrycode")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(dec("c_acctbal")).cast("double").alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )


REG.add(
    "q22_sales_opportunity",
    _q22,
    """
    SELECT cntrycode, COUNT(*) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
    FROM (SELECT substr(c_name, length(c_name), 1) AS cntrycode,
                 c_acctbal, c_custkey
          FROM customer
          WHERE substr(c_name, length(c_name), 1) IN ('1','3','5','7','9')
            AND c_acctbal > (
              SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                     / COUNT(*)
              FROM customer
              WHERE c_acctbal > 0
                AND substr(c_name, length(c_name), 1)
                    IN ('1','3','5','7','9'))) custsale
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '2001-01-01')
    GROUP BY cntrycode
    ORDER BY cntrycode
    """,
)
