"""Property-based tests for the sqlfront tokenizer (hypothesis).

The invariants that make the dialect rewriter safe to run on arbitrary SQL:
  1. Text containing none of the mapped function names passes through
     unchanged.
  2. String-literal contents are never rewritten, no matter what function
     names they contain (the round-1 regex rewriter failed this).
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from phoenix_spark.sqlfront import RENAME, segments, translate_phoenix_sql

_PLAIN = st.text(
    alphabet=st.characters(
        whitelist_categories=("Lu", "Ll", "Nd", "Zs"), max_codepoint=0x7E
    ),
    max_size=60,
)

_FN_NAMES = st.sampled_from(sorted(RENAME))


@settings(max_examples=200, deadline=None)
@given(_PLAIN)
def test_plain_text_passthrough(text):
    # no mapped names, no quotes → identity
    if any(fn in text.upper() for fn in RENAME) or "'" in text or '"' in text:
        return
    assert translate_phoenix_sql(text) == text


@settings(max_examples=200, deadline=None)
@given(_FN_NAMES, _PLAIN)
def test_literal_contents_never_rewritten(fn, payload):
    lit = f"{fn}({payload.replace(chr(39), '')})"
    sql = f"SELECT '{lit}' AS s FROM t"
    out = translate_phoenix_sql(sql)
    assert f"'{lit}'" in out  # literal survives byte-for-byte


@settings(max_examples=200, deadline=None)
@given(st.lists(st.sampled_from(["code ", "'a''b'", '"Quoted Id"', "-- c\n"]), max_size=8))
def test_segments_partition_is_lossless(parts):
    sql = "".join(parts)
    segs = segments(sql)
    assert "".join(text for _, text in segs) == sql


def test_hint_translation():
    from phoenix_spark.sqlfront import translate_phoenix_sql

    # SERIAL and USE_SORT_MERGE_JOIN get Spark analogs; HBase-mechanics
    # hints (scan/index/cache) are dropped per SURVEY §4.1
    out = translate_phoenix_sql(
        "SELECT /*+ SERIAL */ r_name FROM region ORDER BY r_name"
    )
    assert "/*+ COALESCE(1) */" in out
    out = translate_phoenix_sql(
        "SELECT /*+ USE_SORT_MERGE_JOIN */ o.o_orderkey "
        "FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey"
    )
    assert "/*+ MERGE(o) */" in out  # binds to the alias, as Spark requires
    out = translate_phoenix_sql(
        "SELECT /*+ USE_SORT_MERGE_JOIN */ o_orderkey "
        "FROM orders JOIN customer ON o_custkey = c_custkey"
    )
    assert "/*+ MERGE(orders) */" in out  # no alias → table name
    out = translate_phoenix_sql(
        "SELECT /*+ NO_INDEX, SKIP_SCAN, INDEX(t idx) */ 1 FROM orders"
    )
    assert "/*+" not in out  # all dropped, Spark parses clean
    # hint-shaped text inside a string literal is untouched
    out = translate_phoenix_sql("SELECT '/*+ SERIAL */' AS s FROM region")
    assert "'/*+ SERIAL */'" in out
