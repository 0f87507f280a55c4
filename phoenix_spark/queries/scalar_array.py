"""Array function surface (SURVEY.md §2.8 "Functions (Array)").

Phoenix arrays are 1-D, 1-BASED (reference: phoenix-core-client/.../schema/
types/PArrayDataType.java, PhoenixArray.java; ArrayIndexFunction.java for
ARRAY_ELEM; tests ArrayIT / Array1IT-3IT).  Spark's element_at is also
1-based, so index access is a pure translation — the trap would be getItem(),
which is 0-based.

Mappings pinned here:
  ARRAY[...]              → F.array(...)
  ARRAY_ELEM(arr, i)      → element_at(arr, i)       (both 1-based)
  ARRAY_LENGTH            → size
  ARRAY_CAT               → concat
  ARRAY_APPEND/PREPEND    → array_append / array_prepend
  ARRAY_TO_STRING         → array_join
  ARRAY_FILL(v, n)        → array_repeat
  v = ANY(arr)            → array_contains
  v = ALL(arr)            → forall(arr, x -> x = v)

Outputs are scalars (element/size/joined-string/boolean) rather than raw
array columns so the driver's value-hash sees engine-neutral types; this is
also the first query family over the embeddings fixture (embedding:
array<float>).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from phoenix_spark.queries._util import Registry, t

REG = Registry()

# --- 1-based element access + length on the embeddings fixture --------------
REG.add(
    "arr_elem_len",
    lambda spark, sf: t(spark, sf, "embeddings").select(
        "vec_id",
        F.element_at("embedding", 1).cast("double").alias("first_dim"),
        F.element_at("embedding", 4).cast("double").alias("fourth_dim"),
        F.element_at(F.col("embedding"), F.size("embedding")).cast("double").alias(
            "last_dim"
        ),
        F.size("embedding").cast("int").alias("n_dims"),
    ),
    """
    SELECT vec_id,
           CAST(embedding[1] AS DOUBLE)               AS first_dim,
           CAST(embedding[4] AS DOUBLE)               AS fourth_dim,
           CAST(embedding[len(embedding)] AS DOUBLE)  AS last_dim,
           CAST(len(embedding) AS INT)                AS n_dims
    FROM embeddings
    """,
)

# --- constructor / concat / append / fill / to_string ------------------------
REG.add(
    "arr_construct_ops",
    lambda spark, sf: t(spark, sf, "nation").select(
        "n_nationkey",
        F.array_join(
            F.concat(
                F.array(F.col("n_nationkey"), F.col("n_regionkey")),
                F.array(F.lit(7)),
            ),
            ",",
        ).alias("cat_str"),
        F.array_join(
            F.array_append(F.array(F.col("n_regionkey")), F.lit(99)), ","
        ).alias("append_str"),
        F.array_join(F.array_repeat(F.col("n_regionkey"), 3), ",").alias("fill_str"),
        F.array_join(
            F.array_prepend(F.array(F.col("n_nationkey")), F.lit(0)), ","
        ).alias("prepend_str"),
        # ARRAY_REMOVE (post-doc reference function ArrayRemoveFunction.java;
        # not in docs/phoenix.csv) → Spark array_remove
        F.array_join(
            F.array_remove(
                F.array(F.col("n_nationkey"), F.col("n_regionkey"), F.lit(7)),
                7,
            ),
            ",",
        ).alias("remove_str"),
    ),
    """
    SELECT n_nationkey,
           array_to_string([n_nationkey, n_regionkey] || [7], ',')  AS cat_str,
           array_to_string(list_append([n_regionkey], 99), ',')     AS append_str,
           array_to_string([n_regionkey FOR i IN range(3)], ',')    AS fill_str,
           array_to_string(list_prepend(0, [n_nationkey]), ',')     AS prepend_str,
           array_to_string(list_filter([n_nationkey, n_regionkey, 7],
                                       x -> x != 7), ',')           AS remove_str
    FROM nation
    """,
)

# --- UNNEST / explode (UnnestArrayPlan exists in the reference,
# .../execute/UnnestArrayPlan.java, but is unreachable from its SQL grammar;
# Spark's explode/posexplode is the declared superset) -------------------------
REG.add(
    "arr_unnest",
    lambda spark, sf: t(spark, sf, "embeddings")
    .filter(F.col("vec_id") <= 5)
    .select(
        "vec_id",
        F.posexplode(F.col("embedding")).alias("pos0", "val"),
    )
    .select(
        "vec_id",
        (F.col("pos0") + 1).cast("int").alias("dim"),  # 1-based like ARRAY_ELEM
        F.col("val").cast("double").alias("val"),
    ),
    """
    SELECT vec_id,
           CAST(u.pos AS INT)         AS dim,
           CAST(u.val AS DOUBLE)      AS val
    FROM embeddings,
         LATERAL (SELECT unnest(embedding) AS val,
                         generate_subscripts(embedding, 1) AS pos) u
    WHERE vec_id <= 5
    """,
)

# --- ANY / ALL quantified array comparisons (ArrayAnyComparisonExpression,
# ArrayAllComparisonExpression) ------------------------------------------------
REG.add(
    "arr_any_all",
    lambda spark, sf: t(spark, sf, "embeddings").select(
        "vec_id",
        F.array_contains(
            F.transform("embedding", lambda x: x > 0.9), F.lit(True)
        ).alias("any_gt"),
        F.forall("embedding", lambda x: x > -2.0).alias("all_gt"),
        F.array_contains(F.array(F.lit(1), F.lit(3), F.lit(5)), F.col("label")).alias(
            "label_in_arr"
        ),
    ),
    """
    SELECT vec_id,
           len(list_filter(embedding, x -> x > 0.9)) > 0   AS any_gt,
           len(list_filter(embedding, x -> x <= -2.0)) = 0 AS all_gt,
           list_contains([1, 3, 5], label)                 AS label_in_arr
    FROM embeddings
    """,
)
