"""JSON function surface (SURVEY.md §2.8 JSON/BSON).

Phoenix's PJson column type (reference: phoenix-core-client/.../schema/types/
PJson.java:35) is queried with JSON_VALUE / JSON_QUERY / JSON_EXISTS
(JsonValueFunction.java:43, JsonExistsFunction.java; tests Bson1IT-6IT for
the BSON sibling).  Spark mapping: JSON stays a string column; JSON_VALUE →
get_json_object, JSON_EXISTS → get_json_object IS NOT NULL, JSON
construction → to_json(struct(...)).  The events.props fixture is the PJson
analogue.

BSON's DynamoDB-style condition grammar (PhoenixBsonExpression.g) is a
document-column extension — its attribute_exists/begins_with conditions map
to the same get_json_object tests pinned here.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from phoenix_spark.queries._util import Registry, t

REG = Registry()

# --- JSON_VALUE: typed scalar extraction -------------------------------------
REG.add(
    "json_value",
    lambda spark, sf: t(spark, sf, "events").select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("k_num"),
        F.get_json_object("props", "$.k").alias("k_str"),
    ),
    """
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_num,
           json_extract_string(props, '$.k')                 AS k_str
    FROM events
    """,
)

# --- JSON_EXISTS + predicate use ---------------------------------------------
REG.add(
    "json_exists_filter",
    lambda spark, sf: t(spark, sf, "events")
    .filter(
        F.get_json_object("props", "$.k").isNotNull()
        & (F.get_json_object("props", "$.k").cast("long") >= 95)
    )
    .select(
        "event_id",
        "event_type",
        F.get_json_object("props", "$.missing").isNotNull().alias("has_missing"),
    ),
    """
    SELECT event_id, event_type,
           json_extract(props, '$.missing') IS NOT NULL AS has_missing
    FROM events
    WHERE json_extract_string(props, '$.k') IS NOT NULL
      AND CAST(json_extract_string(props, '$.k') AS BIGINT) >= 95
    """,
)

# --- BSON_CONDITION_EXPRESSION: the DynamoDB-style document condition
# grammar (PhoenixBsonExpression.g; BsonConditionExpressionFunction) compiled
# to JVM Column predicates — see phoenix_spark/bson.py -------------------------
def _bson_condition(spark, sf):
    from phoenix_spark.bson import bson_condition

    return (
        t(spark, sf, "events")
        .filter(
            bson_condition(
                "props",
                "attribute_exists(k) AND field_type(k, 'N') "
                "AND (k BETWEEN 20 AND 40 OR k IN (77, 88, 99)) "
                "AND NOT size(k) > 2 AND attribute_not_exists(missing)",
            )
        )
        .select("event_id", "event_type", F.get_json_object("props", "$.k").alias("k"))
    )


REG.add(
    "bson_condition_filter",
    _bson_condition,
    """
    SELECT event_id, event_type, json_extract_string(props, '$.k') AS k
    FROM events
    WHERE json_extract(props, '$.k') IS NOT NULL
      AND regexp_matches(json_extract_string(props, '$.k'), '^-?[0-9]+(\\.[0-9]+)?$')
      AND (CAST(json_extract_string(props, '$.k') AS DOUBLE) BETWEEN 20 AND 40
           OR CAST(json_extract_string(props, '$.k') AS DOUBLE) IN (77, 88, 99))
      AND NOT length(json_extract_string(props, '$.k')) > 2
      AND json_extract(props, '$.missing') IS NULL
    """,
)

# --- JSON construction (JSON_MODIFY analogue: build/rewrite documents) -------
REG.add(
    "json_construct",
    lambda spark, sf: t(spark, sf, "events").select(
        "event_id",
        F.to_json(
            F.struct(
                F.col("event_type").alias("t"),
                F.get_json_object("props", "$.k").cast("long").alias("k"),
            )
        ).alias("doc"),
    ),
    """
    SELECT event_id,
           '{"t":"' || event_type || '","k":'
             || CAST(json_extract_string(props, '$.k') AS BIGINT) || '}' AS doc
    FROM events
    """,
)

# --- BSON_VALUE_TYPE: per-field SQL type name probe --------------------------
# (BsonValueTypeFunction.java:121-143).  A mixed-type document is constructed
# from orders columns on BOTH engines (each with its own JSON builder — the
# probe output is type names, so renderings never meet the hash).  The only
# value-dependent branch, INTEGER vs BIGINT, compares exact integer
# magnitudes (JSON ints parse as int64-class on both sides).
_BVT_FIELDS = ("s", "i", "big", "d", "b", "arr", "obj", "z", "zz")


def _bson_value_type(spark, sf):
    from phoenix_spark import functions as PF

    doc = F.to_json(
        F.struct(
            F.col("o_orderpriority").alias("s"),
            F.col("o_orderkey").alias("i"),
            (F.col("o_orderkey") * F.lit(2000000000)).alias("big"),
            F.col("o_totalprice").alias("d"),
            (F.col("o_orderkey") % 2 == 0).alias("b"),
            F.array(F.col("o_orderkey")).alias("arr"),
            F.struct(F.col("o_orderkey").alias("n")).alias("obj"),
            F.lit(None).cast("int").alias("z"),
        ),
        {"ignoreNullFields": "false"},
    )
    return (
        t(spark, sf, "orders")
        .select("o_orderkey", doc.alias("doc"))
        .select(
            "o_orderkey",
            *[
                PF.bson_value_type("doc", f).alias(f"t_{f}")
                for f in _BVT_FIELDS
            ],
        )
    )


_BVT_CASE = """CASE json_type(doc, '$.{f}')
      WHEN 'VARCHAR' THEN 'VARCHAR' WHEN 'BOOLEAN' THEN 'BOOLEAN'
      WHEN 'DOUBLE' THEN 'DOUBLE'
      WHEN 'UBIGINT' THEN CASE WHEN json_extract(doc, '$.{f}')::BIGINT
                                 BETWEEN -2147483648 AND 2147483647
                               THEN 'INTEGER' ELSE 'BIGINT' END
      WHEN 'BIGINT' THEN CASE WHEN json_extract(doc, '$.{f}')::BIGINT
                                BETWEEN -2147483648 AND 2147483647
                              THEN 'INTEGER' ELSE 'BIGINT' END
      WHEN 'ARRAY' THEN 'BSON' WHEN 'OBJECT' THEN 'BSON'
      WHEN 'NULL' THEN 'NULL' ELSE NULL END AS t_{f}"""

REG.add(
    "bson_value_type",
    _bson_value_type,
    """
    WITH d AS (
      SELECT o_orderkey,
             to_json(struct_pack(
               s := o_orderpriority, i := o_orderkey,
               big := o_orderkey * 2000000000, d := o_totalprice,
               b := o_orderkey % 2 = 0, arr := [o_orderkey],
               obj := struct_pack(n := o_orderkey), z := NULL::INTEGER
             ))::JSON AS doc
      FROM orders
    )
    SELECT o_orderkey, """
    + ",\n           ".join(_BVT_CASE.format(f=f) for f in _BVT_FIELDS)
    + """
    FROM d
    """,
)

# --- JSON_MODIFY from plain SQL (JsonModifyFunction) -------------------------
# Round-5 sqlfront lowering: type-preserving top-level update via a variant
# map rebuild with sorted-key rendering.  The oracle pins the extraction
# invariant (the updated leaf reads back) plus a constant-document update
# whose rendering is fully determined.
def _json_modify(spark, sf):
    import tempfile

    from phoenix_spark.engine import Engine

    e = Engine(spark, sf_dir=sf, warehouse=tempfile.mkdtemp(prefix="phx_wh_"))
    return e.sql(
        """
        SELECT event_id,
               JSON_VALUE(JSON_MODIFY(props, '$.k', '999'), '$.k') AS k_new,
               JSON_MODIFY('{"a":1}', '$.b', '"y"') AS doc_new
        FROM events WHERE props IS NOT NULL
        """
    )


REG.add(
    "json_modify_value",
    _json_modify,
    """
    SELECT event_id, '999' AS k_new, '{"a":1,"b":"y"}' AS doc_new
    FROM events WHERE props IS NOT NULL
    """,
)

# --- the same condition grammar from PLAIN SQL, in the reference's document
# form (round 5: bson.py's SQL-text backend + {"$EXPR","$VAL"} handling,
# exactly as Bson1IT ships conditions).  Same oracle semantics as
# bson_condition_filter with placeholder-bound values.
def _bson_condition_sql(spark, sf):
    import tempfile

    from phoenix_spark.engine import Engine

    e = Engine(spark, sf_dir=sf, warehouse=tempfile.mkdtemp(prefix="phx_wh_"))
    cond = (
        '{"$EXPR": "field_exists(k) AND field_type(k, :N) '
        "AND (k BETWEEN :lo AND :hi OR k IN (77, 88, 99)) "
        'AND NOT size(k) > :w AND field_not_exists(missing)", '
        '"$VAL": {":N": "N", ":lo": 20, ":hi": 40, ":w": 2}}'
    )
    return e.sql(
        "SELECT event_id, event_type, JSON_VALUE(props, '$.k') AS k "
        f"FROM events WHERE BSON_CONDITION_EXPRESSION(props, '{cond}')"
    )


REG.add(
    "bson_condition_sql",
    _bson_condition_sql,
    """
    SELECT event_id, event_type, json_extract_string(props, '$.k') AS k
    FROM events
    WHERE json_extract(props, '$.k') IS NOT NULL
      AND regexp_matches(json_extract_string(props, '$.k'), '^-?[0-9]+(\\.[0-9]+)?$')
      AND (CAST(json_extract_string(props, '$.k') AS DOUBLE) BETWEEN 20 AND 40
           OR CAST(json_extract_string(props, '$.k') AS DOUBLE) IN (77, 88, 99))
      AND NOT length(json_extract_string(props, '$.k')) > 2
      AND json_extract(props, '$.missing') IS NULL
    """,
)


# --- deep-path BSON update expressions (round 7, Bson2IT/Bson3IT replays) ----
def _bson_deep_update(spark, sf):
    """BSON_UPDATE_EXPRESSION over DEEP "." / "[n]" paths
    (UpdateExpressionUtils; Bson2IT.testUpdateExpressions:47): per row,
    build a nested document, apply $SET at a list index + $UNSET of a
    nested key + $ADD of a counter, and project the affected fields back
    out.  All JVM-side JSON/variant expressions — each path level is one
    lambda-bound map/array rebuild, linear plan size, codegen-friendly, no
    shuffle (a pure per-row map at any scale)."""
    from phoenix_spark.bson import bson_update_expression

    df = t(spark, sf, "events").select("event_id", "value")
    doc = F.concat(
        F.lit('{"m":{"list":[1,2,3],"z":5},"v":'),
        F.col("value").cast("long").cast("string"),
        F.lit("}"),
    )
    updated = bson_update_expression(
        doc,
        '{"$SET": {"m.list[1]": 99}, "$UNSET": {"m.z": null},'
        ' "$ADD": {"cnt": 2}}',
    )
    return df.select(
        "event_id",
        F.get_json_object(updated, "$.m.list[1]").cast("int").alias("l1"),
        F.get_json_object(updated, "$.m.z").cast("string").alias("z"),
        F.get_json_object(updated, "$.cnt").cast("int").alias("cnt"),
        F.get_json_object(updated, "$.v").cast("long").alias("v"),
    )


REG.add(
    "bson_deep_update",
    _bson_deep_update,
    """
    SELECT event_id, 99 AS l1, CAST(NULL AS VARCHAR) AS z, 2 AS cnt,
           CAST(trunc(value) AS BIGINT) AS v
    FROM events
    """,
)
