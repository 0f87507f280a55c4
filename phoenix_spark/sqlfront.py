"""Phoenix SQL dialect front-end (minimal, round 1).

Phoenix parses its dialect with an ANTLR3 grammar (reference:
phoenix-core-client/src/main/antlr3/PhoenixSQL.g).  Spark SQL already covers
the ANSI core; this module closes the *dialect* gap with a conservative
token-level rewriter for the constructs that differ.  It deliberately does
NOT attempt a full parser in round 1 — queries() entries are built with the
DataFrame API / Spark SQL directly; this front-end is the compatibility
surface for Phoenix-flavored text.

Currently handled:
  - scalar function-name mapping (SUBSTR→substring is native, but e.g.
    REGEXP_SUBSTR→regexp_extract, ARRAY_LENGTH→size, ... see FUNCTION_MAP)
  - ``??`` no-op (placeholder)

UPSERT / CREATE TABLE with PK constraints / sequences are routed through the
mutation and ddl modules in later rounds.
"""

from __future__ import annotations

import re

# Phoenix name -> Spark SQL name, for functions whose semantics line up
# 1:1 (docs/phoenix.csv "Functions" sections; SURVEY.md §2.8).
FUNCTION_MAP = {
    "REGEXP_SUBSTR": "regexp_extract",
    "ARRAY_LENGTH": "size",
    "ARRAY_ELEM": "element_at",
    "ARRAY_TO_STRING": "array_join",
    "STRING_TO_ARRAY": "split",
    "ARRAY_CAT": "concat",
    "ARRAY_FILL": "array_repeat",
    "TO_NUMBER": "cast_to_double",  # handled via special-case below
    "CURRENT_DATE": "current_timestamp",  # Phoenix DATE carries time (§1.4)
    "CURRENT_TIME": "current_timestamp",
    "JSON_VALUE": "get_json_object",
}

_FN_RE = re.compile(
    r"\b(" + "|".join(FUNCTION_MAP) + r")\s*\(", flags=re.IGNORECASE
)


def translate_phoenix_sql(text: str) -> str:
    """Rewrite Phoenix-dialect SQL into Spark SQL (best-effort, token level)."""

    def _sub(m: re.Match) -> str:
        name = FUNCTION_MAP[m.group(1).upper()]
        if name == "cast_to_double":
            return "double("
        return name + "("

    return _FN_RE.sub(_sub, text)
