"""Equivalence pin for the round-8 Arrow repetition kernel.

`text_repetition_stats` computes its per-row gram statistics in an
Arrow-batched Python kernel (pipeline_text._rep_kernel) instead of the
JVM higher-order-function expressions it used through round 7 (kept as
`arrow_kernel=False`).  These tests pin the only real risk of that swap:
that the Python tokenizer drifts from the JVM's `split(trim(text),
'\\s+')` on some whitespace shape.  Both paths run over (a) an adversarial
synthetic table covering every divergence candidate we reasoned about —
Java-vs-Python \\s class members, space-only trim, leading/trailing
separator empties, sub-3-token exclusions, NULLs, repeated grams — and
(b) the sf0.001 fixture, and must return identical rows.
"""

from __future__ import annotations

import math

from pyspark.sql import Row

from phoenix_spark.queries.pipeline_text import _repetition_stats


def _collect(df):
    out = {}
    for r in df.collect():
        key = r["doc_id"]
        assert key not in out
        vals = (
            r["n_bigrams"],
            r["top_bigram_cnt"],
            r["top2_frac"],
            r["n_tri"],
            r["dup3_frac"],
        )
        for v in vals:
            assert v is not None and not (
                isinstance(v, float) and math.isnan(v)
            )
        out[key] = vals
    return out


EDGE_TEXTS = [
    (1, "plain three token"),
    (2, "a a a a a a"),  # maximal bigram repetition
    (3, "x y x y x y x y"),  # alternating bigrams
    (4, "  leading and trailing spaces  "),  # trim(' ') strips these
    (5, "\ttab\tseparated\ttokens\t"),  # tabs survive trim → empty tokens
    (6, "mixed \t whitespace\n runs \x0b here \f and \r back"),
    (7, "two tokens"),  # excluded: n < 3
    (8, "one"),  # excluded
    (9, ""),  # excluded: split('') = ['']
    (10, "   "),  # excluded: trim → ''
    (11, "\t\t"),  # tabs only → empty tokens, n < 3 → excluded
    (12, None),  # NULL text → excluded
    (13, "a b a b c a b"),  # mixed repetition
    (14, "\tlead tab first"),  # leading empty token participates in grams
    (15, "trail tab last\t"),  # trailing empty token (split keeps it)
    (16, "a\xa0b c d"),  # NBSP is NOT \s in Java: stays ONE token
]


def test_kernel_matches_jvm_expressions_on_edge_cases(spark):
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in EDGE_TEXTS],
        "doc_id bigint, text string",
    )
    import phoenix_spark.queries.pipeline_text as PT

    orig = PT.t
    try:
        PT.t = lambda _spark, _sf, _name: df  # route both paths to the table
        fast = _collect(_repetition_stats(spark, "unused", arrow_kernel=True))
        slow = _collect(_repetition_stats(spark, "unused", arrow_kernel=False))
    finally:
        PT.t = orig
    # the NBSP row proves Java-\s fidelity: 3 tokens (not 4), n_bigrams=2
    assert fast[16][0] == 2
    assert set(fast) == {1, 2, 3, 4, 5, 6, 13, 14, 15, 16}
    assert fast == slow


def test_kernel_matches_jvm_expressions_on_fixture(spark):
    fast = _collect(_repetition_stats(spark, "/root/testdata/sf0.001"))
    slow = _collect(
        _repetition_stats(spark, "/root/testdata/sf0.001", arrow_kernel=False)
    )
    assert len(fast) > 0
    assert fast == slow


def test_repetition_schema_unchanged(spark):
    df = _repetition_stats(spark, "/root/testdata/sf0.001")
    assert df.schema.simpleString() == (
        "struct<doc_id:bigint,n_bigrams:int,top_bigram_cnt:int,"
        "top2_frac:double,n_tri:int,dup3_frac:double>"
    )
