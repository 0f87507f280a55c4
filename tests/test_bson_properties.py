"""Property-based model check for bson_update_expression: random flat
documents x random update specs vs a pure-Python reference implementation of
UpdateExpressionUtils' SET -> UNSET -> ADD -> DELETE_FROM_SET chain."""

from __future__ import annotations

import json

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

FIELDS = ["a", "b", "c", "d"]
SCALARS = st.one_of(
    st.integers(min_value=-1000, max_value=1000),
    st.booleans(),
    st.text(alphabet="xyz", max_size=3),
    st.none(),
)
SETVALS = st.lists(
    st.one_of(st.integers(min_value=0, max_value=9), st.text(alphabet="pq", min_size=1, max_size=2)),
    max_size=3,
)

DOCS = st.dictionaries(st.sampled_from(FIELDS), st.one_of(SCALARS, SETVALS), max_size=4)


@st.composite
def specs(draw):
    spec = {}
    if draw(st.booleans()):
        spec["$SET"] = draw(st.dictionaries(st.sampled_from(FIELDS), st.one_of(SCALARS, SETVALS), max_size=2))
    if draw(st.booleans()):
        spec["$UNSET"] = {f: None for f in draw(st.lists(st.sampled_from(FIELDS), max_size=2))}
    if draw(st.booleans()):
        spec["$ADD"] = draw(st.dictionaries(st.sampled_from(FIELDS), st.one_of(st.integers(min_value=-50, max_value=50), SETVALS), max_size=2))
    if draw(st.booleans()):
        spec["$DELETE_FROM_SET"] = draw(st.dictionaries(st.sampled_from(FIELDS), SETVALS, max_size=2))
    return spec


def _model(doc: dict, spec: dict):
    """Pure-Python UpdateExpressionUtils.updateExpression (top-level)."""
    out = dict(doc)
    for f, v in spec.get("$SET", {}).items():
        out[f] = v
    for f in spec.get("$UNSET", {}):
        out.pop(f, None)
    # NB: an explicit JSON null is PRESENT-with-wrong-type, not absent —
    # UpdateExpressionUtils' bsonDocument.get() returns BsonNull (a non-null
    # reference), so ADD/DELETE on it throw (reference: UpdateExpressionUtils
    # .java modifyFieldValueByDeleteFromSet / executeAddExpression).
    for f, addend in spec.get("$ADD", {}).items():
        if isinstance(addend, list):
            cur = [] if f not in out else out[f]
            if not isinstance(cur, list):
                return "ERROR"
            merged = list(cur)
            for x in addend:
                if x not in merged:
                    merged.append(x)
            out[f] = sorted(merged, key=lambda x: json.dumps(x))
        else:
            cur = 0 if f not in out else out[f]
            if isinstance(cur, bool) or not isinstance(cur, (int, float)):
                return "ERROR"
            total = float(cur) + float(addend)
            out[f] = int(total) if total == int(total) else total
    for f, dels in spec.get("$DELETE_FROM_SET", {}).items():
        if f not in out:
            continue  # absent -> no-op
        cur = out[f]
        if not isinstance(cur, list):
            return "ERROR"  # includes explicit null (BsonNull is not a set)
        kept = sorted(
            {json.dumps(x) for x in cur} - {json.dumps(x) for x in dels}
        )
        out[f] = [json.loads(x) for x in kept]
    return out


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(doc=DOCS, spec=specs())
def test_update_expression_matches_model(spark, doc, spec):
    from phoenix_spark.bson import BsonUpdateError, bson_update_expression

    # plan-time rejects are modeled as ERROR too (same-field ADD+DELETE)
    add_del_overlap = set(spec.get("$ADD", {})) & set(
        spec.get("$DELETE_FROM_SET", {})
    )
    expected = _model(doc, spec)
    df = spark.createDataFrame([(json.dumps(doc),)], ["doc"])
    try:
        col = bson_update_expression("doc", json.dumps(spec))
    except BsonUpdateError:
        # statically-detectable mismatch: the model must also error, unless
        # it's the ADD+DELETE-same-field plan-time reject (the model chains
        # them instead)
        assert expected == "ERROR" or add_del_overlap
        return
    try:
        got = json.loads(df.select(col.alias("u")).collect()[0].u)
    except Exception:
        assert expected == "ERROR"
        return
    assert expected != "ERROR", f"engine succeeded where model errors: {got}"
    assert got == {k: v for k, v in sorted(expected.items())}


# --- dual-backend equivalence (round 5) --------------------------------------
# The condition grammar compiles through TWO backends: Column expressions
# (bson_condition) and Spark SQL text (bson_condition_sql, the sqlfront
# path).  For arbitrary documents and a spread of condition shapes, both
# must select exactly the same rows.

from hypothesis import given, settings
from hypothesis import strategies as st

_COND_TEMPLATES = [
    "attribute_exists(k)",
    "field_not_exists(missing)",
    "k >= {n}",
    "k < {n} OR s = '{w}'",
    "begins_with(s, '{p}') AND k BETWEEN {n} AND {m}",
    "contains(s, '{p}')",
    "field_type(k, 'N') AND NOT size(s) > {n}",
    "k IN ({n}, {m}, 99)",
]


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=-50, max_value=150),
            st.text(alphabet="abcxyz", min_size=0, max_size=6),
        ),
        min_size=1,
        max_size=8,
    ),
    st.sampled_from(_COND_TEMPLATES),
    st.integers(min_value=-10, max_value=60),
    st.integers(min_value=0, max_value=120),
    st.sampled_from(["a", "xy", "bc"]),
)
def test_condition_backends_agree(spark, rows, template, n, m, p):
    import json

    from phoenix_spark.bson import bson_condition, bson_condition_sql

    cond = template.format(n=n, m=m, w=p, p=p)
    docs = [
        (i, json.dumps({"k": k, "s": s})) for i, (k, s) in enumerate(rows)
    ]
    df = spark.createDataFrame(docs, "id: long, props: string")
    via_column = {r.id for r in df.filter(bson_condition("props", cond)).collect()}
    df.createOrReplaceTempView("bson_prop_docs")
    sql_pred = bson_condition_sql("props", cond)
    via_sql = {
        r.id
        for r in spark.sql(
            f"SELECT id FROM bson_prop_docs WHERE {sql_pred}"
        ).collect()
    }
    assert via_column == via_sql, (cond, via_column, via_sql)
