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
