"""Set operations + subquery predicates (SURVEY.md §2.7 / §2.2).

UNION ALL is Phoenix's only set op (grammar PhoenixSQL.g:873-876); its
UnionCompiler type-unifies the arm schemas (reference: phoenix-core-client/
.../compile/UnionCompiler.java:266-271 — e.g. an INTEGER arm against a BIGINT
arm coerces to BIGINT), and ORDER BY/LIMIT over the union is pushed into the
arms (QueryCompiler.compileUnionAll:252-261).  INTERSECT / EXCEPT are
declared beyond-reference extensions (Spark-native).

Subquery predicates (IN / NOT IN / EXISTS / ANY/ALL, grammar :1087-1098) are
rewritten by SubqueryRewriter (.../compile/SubqueryRewriter.java class doc)
into semi-/anti-/left joins; here they are written as *SQL text* so Catalyst's
RewritePredicateSubquery performs the identical rewrite (the DataFrame-level
semi/anti joins are pinned separately in joins.py).

Scale: unions are metadata-level concatenations (no shuffle); the subquery
rewrites become broadcast semi/anti joins for dimension-sized inner sides.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from phoenix_spark.queries._util import Registry, t, views

REG = Registry()

# --- UNION ALL with Phoenix type unification (int arm + bigint arm) ----------
# nation.n_nationkey is INTEGER, customer.c_custkey is BIGINT: Phoenix coerces
# the union output to BIGINT (UnionCompiler.java:266); we replicate with an
# explicit cast on the narrow arm.  DuckDB applies the same widening.
REG.add(
    "setop_union_all",
    lambda spark, sf: t(spark, sf, "nation")
    .select(
        F.col("n_nationkey").cast("long").alias("k"),
        F.col("n_name").alias("name"),
    )
    .unionByName(
        t(spark, sf, "customer")
        .filter(F.col("c_acctbal") > 9000)
        .select(F.col("c_custkey").alias("k"), F.col("c_name").alias("name"))
    ),
    """
    SELECT n_nationkey AS k, n_name AS name FROM nation
    UNION ALL
    SELECT c_custkey AS k, c_name AS name FROM customer WHERE c_acctbal > 9000
    """,
)

# --- ORDER BY / LIMIT pushed into UNION arms (LimitPushDown) ------------------
REG.add(
    "setop_union_all_topk",
    lambda spark, sf: t(spark, sf, "customer")
    .select(F.col("c_custkey").alias("k"), F.col("c_acctbal").cast("double").alias("v"))
    .unionByName(
        t(spark, sf, "supplier").select(
            F.col("s_suppkey").alias("k"), F.col("s_acctbal").cast("double").alias("v")
        )
    )
    .orderBy(F.col("v").desc(), F.col("k"))
    .limit(12),
    """
    SELECT * FROM (
      SELECT c_custkey AS k, CAST(c_acctbal AS DOUBLE) AS v FROM customer
      UNION ALL
      SELECT s_suppkey AS k, CAST(s_acctbal AS DOUBLE) AS v FROM supplier
    ) u ORDER BY v DESC, k LIMIT 12
    """,
)

# --- INTERSECT (beyond-reference extension; distinct semantics) ---------------
REG.add(
    "setop_intersect",
    lambda spark, sf: t(spark, sf, "orders")
    .select(F.col("o_custkey").alias("k"))
    .intersect(
        t(spark, sf, "customer")
        .filter(F.col("c_acctbal") > 5000)
        .select(F.col("c_custkey").alias("k"))
    ),
    """
    SELECT o_custkey AS k FROM orders
    INTERSECT
    SELECT c_custkey AS k FROM customer WHERE c_acctbal > 5000
    """,
)

# --- EXCEPT (beyond-reference extension; distinct semantics) ------------------
REG.add(
    "setop_except",
    lambda spark, sf: t(spark, sf, "customer")
    .select(F.col("c_custkey").alias("k"))
    .subtract(t(spark, sf, "orders").select(F.col("o_custkey").alias("k"))),
    """
    SELECT c_custkey AS k FROM customer
    EXCEPT
    SELECT o_custkey AS k FROM orders
    """,
)

# --- IN (subquery) → semi join (SubqueryRewriter §2.2) ------------------------
def _subq_in(spark, sf):
    views(spark, sf)
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey FROM orders
        WHERE o_custkey IN (
          SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        ) AND o_totalprice > 350000
        """
    )


REG.add(
    "subq_in",
    _subq_in,
    """
    SELECT o_orderkey, o_custkey FROM orders
    WHERE o_custkey IN (
      SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    ) AND o_totalprice > 350000
    """,
)

# --- NOT IN (subquery) — anti join; inner side is NULL-free so no 3VL trap ---
def _subq_not_in(spark, sf):
    views(spark, sf)
    return spark.sql(
        """
        SELECT c_custkey, c_name FROM customer
        WHERE c_custkey NOT IN (
          SELECT o_custkey FROM orders WHERE o_totalprice > 100000
        ) AND c_acctbal > 9500
        """
    )


REG.add(
    "subq_not_in",
    _subq_not_in,
    """
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey NOT IN (
      SELECT o_custkey FROM orders WHERE o_totalprice > 100000
    ) AND c_acctbal > 9500
    """,
)

# --- correlated EXISTS (CorrelateVariableFieldAccessExpression; Catalyst
# decorrelates natively) -------------------------------------------------------
_EXISTS_SQL = """
    SELECT s_suppkey, s_name FROM supplier s
    WHERE EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity >= 49
    )
"""


def _subq_exists(spark, sf):
    views(spark, sf)
    return spark.sql(_EXISTS_SQL)


REG.add("subq_exists_correlated", _subq_exists, _EXISTS_SQL)

# --- NOT EXISTS (correlated anti) ---------------------------------------------
_NOT_EXISTS_SQL = """
    SELECT s_suppkey, s_name FROM supplier s
    WHERE NOT EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_suppkey = s.s_suppkey AND l.l_discount > 0.09
    )
"""


def _subq_not_exists(spark, sf):
    views(spark, sf)
    return spark.sql(_NOT_EXISTS_SQL)


REG.add("subq_not_exists", _subq_not_exists, _NOT_EXISTS_SQL)

# --- scalar subquery (uncorrelated; exact MAX so both engines agree bit-for-
# bit on the threshold double) --------------------------------------------------
_SCALAR_SQL = """
    SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS o_totalprice FROM orders
    WHERE o_totalprice > (SELECT MAX(o_totalprice) FROM orders) * 0.97
"""


def _subq_scalar(spark, sf):
    views(spark, sf)
    return spark.sql(_SCALAR_SQL)


REG.add("subq_scalar", _subq_scalar, _SCALAR_SQL)

# --- correlated scalar subquery (CorrelateVariableFieldAccessExpression;
# Catalyst decorrelates into an aggregate + join) ------------------------------
_CORR_SCALAR_SQL = """
    SELECT o_orderkey, o_custkey, CAST(o_totalprice AS DOUBLE) AS o_totalprice
    FROM orders o
    WHERE o_totalprice = (SELECT MAX(o2.o_totalprice) FROM orders o2
                          WHERE o2.o_custkey = o.o_custkey)
      AND o_custkey <= 300
"""


def _subq_scalar_corr(spark, sf):
    views(spark, sf)
    return spark.sql(_CORR_SCALAR_SQL)


REG.add("subq_scalar_correlated", _subq_scalar_corr, _CORR_SCALAR_SQL)

# --- ANY/ALL quantified comparison (grammar :1087-1098).  Phoenix rewrites
# ALL to a MIN/MAX aggregate of the subquery; Spark SQL lacks ANY/ALL, so the
# Spark side IS that rewrite, while the oracle runs the literal > ALL form. ---
def _subq_all(spark, sf):
    views(spark, sf)
    return spark.sql(
        """
        SELECT c_custkey, CAST(c_acctbal AS DOUBLE) AS c_acctbal FROM customer
        WHERE c_acctbal > (SELECT MAX(s_acctbal) FROM supplier)
        """
    )


REG.add(
    "subq_all_quantified",
    _subq_all,
    """
    SELECT c_custkey, CAST(c_acctbal AS DOUBLE) AS c_acctbal FROM customer
    WHERE c_acctbal > ALL (SELECT s_acctbal FROM supplier)
    """,
)

# --- INTERSECT ALL / EXCEPT ALL (bag semantics; beyond-reference) -------------
# Phoenix has no set ops beyond UNION ALL; Spark's intersectAll/exceptAll are
# the bag-semantics variants (multiplicity = min / difference of counts).
REG.add(
    "setop_intersect_all",
    lambda spark, sf: t(spark, sf, "orders")
    .select(F.col("o_custkey").alias("k"))
    .intersectAll(
        t(spark, sf, "lineitem")
        .filter(F.col("l_quantity") >= 45)
        .select(F.col("l_suppkey").alias("k"))
    ),
    """
    SELECT o_custkey AS k FROM orders
    INTERSECT ALL
    SELECT l_suppkey AS k FROM lineitem WHERE l_quantity >= 45
    """,
)

REG.add(
    "setop_except_all",
    lambda spark, sf: t(spark, sf, "lineitem")
    .filter(F.col("l_linenumber") <= 2)
    .select(F.col("l_suppkey").alias("k"))
    .exceptAll(t(spark, sf, "supplier").select(F.col("s_suppkey").alias("k"))),
    """
    SELECT l_suppkey AS k FROM lineitem WHERE l_linenumber <= 2
    EXCEPT ALL
    SELECT s_suppkey AS k FROM supplier
    """,
)
