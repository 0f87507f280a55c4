"""BSON/document condition-expression language (SURVEY.md §1.4 PBson).

Phoenix's PBson column type ships a DynamoDB-style condition grammar
(reference: phoenix-core-client/src/main/antlr3/PhoenixBsonExpression.g:18-40
— `attribute_exists`, `attribute_not_exists`, `begins_with`, `contains`,
`size`, `field_type`, comparisons, BETWEEN, IN, AND/OR/NOT; evaluated by
BsonConditionExpressionFunction; tests Bson1IT-6IT).

Here documents are JSON text columns (the PJson/PBson analogue) and the
condition compiles to a pure JVM Column expression over get_json_object —
no UDFs, so document filters stay inside whole-stage codegen and push down
as far as Catalyst can take them.

    bson_condition(F.col("props"), "attribute_exists(k) AND k >= 50")
"""

from __future__ import annotations

import re

from pyspark.sql import Column, functions as F

_TOKEN_RE = re.compile(
    r"""\s*(?:
        (?P<lpar>\()|(?P<rpar>\))|(?P<comma>,)
      | (?P<op><=|>=|<>|!=|=|<|>)
      | (?P<string>'(?:[^']|'')*')
      | (?P<number>-?\d+(?:\.\d+)?)
      | (?P<placeholder>[:$][A-Za-z_]\w*)
      | (?P<word>[A-Za-z_][\w.\[\]]*)
    )""",
    re.VERBOSE,
)

_KEYWORDS = {"AND", "OR", "NOT", "BETWEEN", "IN"}
# field_exists / field_not_exists / attribute_type are the SQL-style
# spellings (SQLComparisonExpressionUtils; Bson1IT uses both dialects)
_FUNCS = {
    "ATTRIBUTE_EXISTS",
    "ATTRIBUTE_NOT_EXISTS",
    "FIELD_EXISTS",
    "FIELD_NOT_EXISTS",
    "BEGINS_WITH",
    "CONTAINS",
    "SIZE",
    "FIELD_TYPE",
    "ATTRIBUTE_TYPE",
}


class BsonConditionError(ValueError):
    pass


def _tokenize(text: str) -> list[tuple[str, str]]:
    out, pos = [], 0
    while pos < len(text):
        m = _TOKEN_RE.match(text, pos)
        if not m:
            if text[pos:].strip():
                raise BsonConditionError(f"bad token at: {text[pos:pos + 20]!r}")
            break
        kind = m.lastgroup
        val = m.group(m.lastgroup)
        if kind == "word" and val.upper() in _KEYWORDS:
            kind = val.upper()
        out.append((kind, val))
        pos = m.end()
    out.append(("eof", ""))
    return out


class _ColumnOps:
    """Builds Column expressions (the DataFrame execution backend)."""

    def __init__(self, doc: Column):
        self.doc = doc

    def extract(self, path: str):
        # a.b[0].c → $.a.b[0].c (JSONPath is also 0-based for arrays)
        return F.get_json_object(self.doc, f"$.{path}")

    def exists(self, x):
        return x.isNotNull()

    def not_exists(self, x):
        return x.isNull()

    def begins_with(self, x, s):
        return x.startswith(s)

    def contains(self, x, s):
        return x.contains(s)

    def rlike(self, x, pat):
        return x.rlike(pat)

    def size(self, x):
        return F.length(x).cast("double")

    def num(self, x):
        return x.cast("double")

    def cmp(self, op, x, v, kind):
        if kind == "num":
            left, right = x.cast("double"), F.lit(float(v))
        elif kind == "bool":
            left, right = x, F.lit("true" if v else "false")
        else:
            left, right = x, F.lit(v)
        # absent field / non-castable value → FALSE, not SQL-unknown: the
        # reference evaluates document comparisons two-valued
        # (SQLComparisonExpressionUtils: exists-and-compares), so
        # NOT (missing = x) is TRUE (Bson3IT.java:171-182)
        return F.coalesce(
            {
                "=": left == right,
                "<>": left != right,
                "<": left < right,
                "<=": left <= right,
                ">": left > right,
                ">=": left >= right,
            }[op],
            F.lit(False),
        )

    def between(self, x, lo, hi):
        return F.coalesce(x.cast("double").between(lo, hi), F.lit(False))

    def isin(self, x, vals, numeric):
        if numeric:
            return F.coalesce(
                x.cast("double").isin(*[float(v) for v in vals]),
                F.lit(False),
            )
        return F.coalesce(x.isin(*vals), F.lit(False))

    def and_(self, a, b):
        return a & b

    def or_(self, a, b):
        return a | b

    def not_(self, a):
        return ~a


class _SqlOps:
    """Builds Spark SQL text (the sqlfront translation backend) — same
    semantics as _ColumnOps expression-for-expression."""

    def __init__(self, doc_sql: str):
        self.doc = doc_sql

    @staticmethod
    def _slit(s) -> str:
        return "'" + str(s).replace("'", "''") + "'"

    def extract(self, path: str):
        return f"get_json_object({self.doc}, '$.{path}')"

    def exists(self, x):
        return f"({x} IS NOT NULL)"

    def not_exists(self, x):
        return f"({x} IS NULL)"

    def begins_with(self, x, s):
        return f"startswith({x}, {self._slit(s)})"

    def contains(self, x, s):
        return f"contains({x}, {self._slit(s)})"

    def rlike(self, x, pat):
        return f"({x} RLIKE '" + pat.replace("\\", "\\\\") + "')"

    def size(self, x):
        return f"cast(length({x}) as double)"

    def num(self, x):
        return f"cast({x} as double)"

    def cmp(self, op, x, v, kind):
        if kind == "num":
            left, right = self.num(x), repr(float(v))
        elif kind == "bool":
            left, right = x, self._slit("true" if v else "false")
        else:
            left, right = x, self._slit(v)
        # two-valued like the Column backend: absent field → FALSE
        return f"coalesce(({left} {op} {right}), false)"

    def between(self, x, lo, hi):
        return (
            f"coalesce(({self.num(x)} BETWEEN {float(lo)!r} "
            f"AND {float(hi)!r}), false)"
        )

    def isin(self, x, vals, numeric):
        if numeric:
            items = ", ".join(repr(float(v)) for v in vals)
            return f"coalesce(({self.num(x)} IN ({items})), false)"
        items = ", ".join(self._slit(v) for v in vals)
        return f"coalesce(({x} IN ({items})), false)"

    def and_(self, a, b):
        return f"({a} AND {b})"

    def or_(self, a, b):
        return f"({a} OR {b})"

    def not_(self, a):
        return f"(NOT {a})"


def _unwrap_condition(condition: str) -> tuple[str, dict]:
    """Accept either a bare expression or the reference's condition
    DOCUMENT form (BsonConditionExpressionFunction:99-101):
    ``{"$EXPR": expr, "$VAL": {":ph": value, ...}, "$KEYS": {"#a": path}}``
    — $KEYS aliases substitute into the expression, $VAL placeholder
    values resolve at :name references."""
    cond = condition.strip()
    if not cond.startswith("{"):
        return cond, {}
    import json as _json

    try:
        d = _json.loads(cond)
    except ValueError as e:
        raise BsonConditionError(f"bad condition document: {e}") from None
    expr = d.get("$EXPR")
    if not isinstance(expr, str):
        raise BsonConditionError("condition document requires a string $EXPR")
    vals = d.get("$VAL") or {}
    for alias in sorted(d.get("$KEYS") or {}, key=len, reverse=True):
        expr = expr.replace(alias, (d["$KEYS"])[alias])
    return expr, vals


class _Parser:
    def __init__(self, ops, text: str, vals: dict | None = None):
        self.ops = ops
        self.vals = vals or {}
        self.toks = _tokenize(text)
        self.i = 0

    def peek(self):
        return self.toks[self.i]

    def take(self, kind=None):
        k, v = self.toks[self.i]
        if kind and k != kind:
            raise BsonConditionError(f"expected {kind}, got {k} {v!r}")
        self.i += 1
        return k, v

    def parse(self):
        c = self._or()
        self.take("eof")
        return c

    def _or(self):
        left = self._and()
        while self.peek()[0] == "OR":
            self.take()
            left = self.ops.or_(left, self._and())
        return left

    def _and(self):
        left = self._not()
        while self.peek()[0] == "AND":
            self.take()
            left = self.ops.and_(left, self._not())
        return left

    def _not(self):
        if self.peek()[0] == "NOT":
            self.take()
            return self.ops.not_(self._not())
        return self._primary()

    def _primary(self):
        k, v = self.peek()
        if k == "lpar":
            self.take()
            c = self._or()
            self.take("rpar")
            return c
        if k == "word" and v.upper() in _FUNCS and self.toks[self.i + 1][0] == "lpar":
            return self._func_or_comparison()
        return self._comparison(self._operand())

    def _func_or_comparison(self):
        _, name = self.take("word")
        up = name.upper()
        self.take("lpar")
        _, path = self.take("word")
        ex = self.ops.extract(path)
        if up in ("ATTRIBUTE_EXISTS", "FIELD_EXISTS"):
            self.take("rpar")
            return self.ops.exists(ex)
        if up in ("ATTRIBUTE_NOT_EXISTS", "FIELD_NOT_EXISTS"):
            self.take("rpar")
            return self.ops.not_exists(ex)
        if up == "BEGINS_WITH":
            self.take("comma")
            lit = self._literal()
            self.take("rpar")
            return self.ops.begins_with(ex, lit)
        if up == "CONTAINS":
            self.take("comma")
            lit = self._literal()
            self.take("rpar")
            return self.ops.contains(ex, lit)
        if up in ("FIELD_TYPE", "ATTRIBUTE_TYPE"):
            self.take("comma")
            lit = self._literal()
            self.take("rpar")
            if lit == "N":
                return self.ops.rlike(ex, r"^-?[0-9]+(\.[0-9]+)?$")
            if lit == "S":
                return self.ops.and_(
                    self.ops.exists(ex),
                    self.ops.not_(
                        self.ops.rlike(
                            ex, r"^-?[0-9]+(\.[0-9]+)?$|^\[|^\{"
                        )
                    ),
                )
            if lit == "L":
                return self.ops.begins_with(ex, "[")
            if lit == "M":
                return self.ops.begins_with(ex, "{")
            # other DynamoDB type tags (SS/NS/BS/B/BOOL/NULL) have no JSON
            # shape to probe distinctly → no row matches, like the
            # reference's attribute_type on a non-matching tag
            return self.ops.and_(self.ops.exists(ex), self.ops.not_exists(ex))
        if up == "SIZE":
            self.take("rpar")
            return self._comparison(self.ops.size(ex), numeric=True)
        raise BsonConditionError(f"unknown function {name}")

    def _operand(self):
        k, v = self.peek()
        if k == "word":
            self.take()
            return self.ops.extract(v)
        raise BsonConditionError(f"expected a document path, got {v!r}")

    def _literal(self):
        k, v = self.take()
        if k == "string":
            return v[1:-1].replace("''", "'")
        if k == "number":
            return float(v) if "." in v else int(v)
        if k == "placeholder":
            if v not in self.vals:
                raise BsonConditionError(f"unbound placeholder {v!r}")
            return self.vals[v]
        raise BsonConditionError(f"expected a literal, got {v!r}")

    def _comparison(self, left, numeric: bool = False):
        k, v = self.take()
        if k == "op":
            lit = self._literal()
            op = "<>" if v == "!=" else v
            if isinstance(lit, bool):
                kind = "bool"
            elif isinstance(lit, (int, float)) or numeric:
                kind = "num"
            else:
                kind = "str"
            return self.ops.cmp(op, left, lit, kind)
        if k == "BETWEEN":
            lo = self._literal()
            self.take("AND")
            hi = self._literal()
            return self.ops.between(left, lo, hi)
        if k == "IN":
            self.take("lpar")
            lits = [self._literal()]
            while self.peek()[0] == "comma":
                self.take()
                lits.append(self._literal())
            self.take("rpar")
            num = all(
                isinstance(x, (int, float)) and not isinstance(x, bool)
                for x in lits
            )
            return self.ops.isin(left, lits, num)
        raise BsonConditionError(f"expected a comparison, got {v!r}")


def bson_condition(doc: Column | str, condition: str) -> Column:
    """Compile a BSON/DynamoDB-style condition expression into a Column
    predicate over a JSON document column.  Accepts both the bare
    expression and the reference's ``{"$EXPR", "$VAL", "$KEYS"}`` document
    form."""
    if isinstance(doc, str):
        doc = F.col(doc)
    expr, vals = _unwrap_condition(condition)
    return _Parser(_ColumnOps(doc), expr, vals).parse()


def bson_condition_sql(doc_sql: str, condition: str) -> str:
    """Compile the same condition language to Spark SQL TEXT — the
    sqlfront backend for ``BSON_CONDITION_EXPRESSION(doc, '...')`` in
    plain SQL.  ``doc_sql`` is the already-translated document
    expression."""
    expr, vals = _unwrap_condition(condition)
    return _Parser(_SqlOps(doc_sql), expr, vals).parse()


# ---------------------------------------------------------------------------
# BSON_UPDATE_EXPRESSION (UpdateExpressionUtils.java:104-118;
# BsonUpdateExpressionFunction.java): applies
#   { "$SET": {f: v, ...}, "$UNSET": {f: null, ...},
#     "$ADD": {f: n | [..], ...}, "$DELETE_FROM_SET": {f: [..], ...} }
# to a document.  Documents are JSON strings here; the update is a static
# literal (as in UPSERT ... ON DUPLICATE KEY), so the plan is built at
# compile time and evaluated entirely JVM-side over map<string,variant> —
# value types survive the round-trip (ints stay ints, bools stay bools).
#
# Deep "." / "[n]" paths (round 7, Bson2IT/Bson3IT replays): each object
# level rebuilds a sorted map<string,variant>, each array level splices the
# 0-based index — the Column-level mirror of sqlfront._json_modify_expr.
# DynamoDB-style set literals ({"$set": [...]}) canonicalize to arrays (the
# engine's JSON set representation).
# ---------------------------------------------------------------------------

import json as _json


class BsonUpdateError(ValueError):
    """An update expression this engine refuses to silently mis-apply."""


def _variant_lit(value) -> Column:
    """A JSON literal as a variant Column (type-preserving)."""
    return F.parse_json(F.lit(_json.dumps(value)))


def _json_texts(variant_col: Column) -> Column:
    """A variant array as an array of canonical JSON texts (set identity)."""
    return F.transform(
        F.try_variant_get(variant_col, "$", "array<variant>"),
        lambda e: F.to_json(e),
    )


def _texts_to_variant(texts: Column) -> Column:
    """Rebuild a variant array from JSON-text elements."""
    return F.parse_json(
        F.concat(F.lit("["), F.concat_ws(",", texts), F.lit("]"))
    )


def _st(state, kind: str) -> bool:
    """True when a per-field fold state is the given tuple kind (a Column
    state never equals a tuple; Column.__eq__ builds an expression)."""
    return isinstance(state, tuple) and state[0] == kind


def _unwrap_set(value):
    """DynamoDB-style {"$set": [...]} set literal → plain list."""
    if isinstance(value, dict) and set(value) == {"$set"}:
        return value["$set"]
    return value


def _parse_bson_path(field: str) -> list[object]:
    """'a.b[2][1].c' → ['a', 'b', 2, 1, 'c'] (0-based indices)."""
    segs: list[object] = []
    rest = field
    first = True
    while rest:
        m = re.match(r"\.?([A-Za-z_]\w*)", rest) if not first else re.match(
            r"([A-Za-z_]\w*)", rest
        )
        if m:
            segs.append(m.group(1))
            rest = rest[m.end():]
            first = False
            continue
        m = re.match(r"\[(\d+)\]", rest)
        if m:
            segs.append(int(m.group(1)))
            rest = rest[m.end():]
            first = False
            continue
        raise BsonUpdateError(f"unparseable document path {field!r}")
    return segs


def _sorted_obj_json(m: Column) -> Column:
    """map<string,variant> → JSON text with keys sorted (deterministic)."""
    entries = F.array_sort(
        F.map_entries(m),
        lambda a, b: F.when(a["key"] < b["key"], -1)
        .when(a["key"] > b["key"], 1)
        .otherwise(0),
    )
    return F.to_json(F.map_from_entries(entries))


def _bind(col: Column, fn) -> Column:
    """Evaluate ``col`` ONCE and pass it to ``fn`` as a lambda variable.

    Every deep-path level references its document text several times
    (map_filter + get_json_object + splice); inlining the previous level's
    expression at each reference grows the plan EXPONENTIALLY in path depth
    × op count (a 9-op Bson2IT update OOMed the driver during analysis).
    ``element_at(transform(array(x), f), 1)`` turns those references into
    lambda-variable reads — plan size becomes linear."""
    return F.element_at(F.transform(F.array(col), fn), 1)


# UpdateExpressionUtils.INVALID_UPDATE_PATH_MESSAGE (UpdateExpressionUtils.java:49):
# every op throws BsonUpdateInvalidArgumentException when a path INTERMEDIATE is
# missing or the wrong container type (updateNestedField:363-426); only the LEAF
# may be absent (SET/ADD create it, UNSET/DELETE_FROM_SET no-op).
_INVALID_PATH_MSG = (
    "The document path provided in the update expression is invalid for update"
)


def _jsonpath(segs: list[object]) -> str:
    """Render parsed path segments back to a get_json_object JSONPath."""
    out = "$"
    for s in segs:
        out += f"[{s}]" if isinstance(s, int) else f".{s}"
    return out


def _guard_present(col: Column) -> Column:
    """Raise the reference's invalid-path error when an intermediate path
    level resolves to NULL (missing field / wrong container type) instead of
    silently splicing nulls or fabricating the level."""
    return F.when(col.isNull(), F.raise_error(F.lit(_INVALID_PATH_MSG))).otherwise(col)


def _deep_set_json(doc_text: Column, segs: list[object], new_text: Column) -> Column:
    """Updated-JSON-text Column: set the value at ``segs`` to ``new_text``
    (itself a JSON-text Column).  Mirror of sqlfront._json_modify_expr."""
    seg, rest = segs[0], segs[1:]

    def build(d: Column) -> Column:
        if isinstance(seg, int):
            arr = _guard_present(F.from_json(d, "array<variant>"))
            if rest:
                inner = _guard_present(F.to_json(F.element_at(arr, seg + 1)))
                nt = _deep_set_json(inner, rest, new_text)
            else:
                nt = new_text
            return F.to_json(
                F.concat(
                    F.slice(arr, 1, seg),
                    F.array(F.parse_json(nt)),
                    F.slice(arr, F.lit(seg + 2), F.size(arr)),
                )
            )
        if rest:
            inner = _guard_present(F.get_json_object(d, f"$.{seg}"))
            nt = _deep_set_json(inner, rest, new_text)
        else:
            nt = new_text
        merged = F.map_concat(
            F.map_filter(
                _guard_present(F.from_json(d, "map<string,variant>")),
                lambda k, _v: k != seg,
            ),
            F.create_map(F.lit(seg), F.parse_json(nt)),
        )
        return _sorted_obj_json(merged)

    return _bind(doc_text, build)


def _deep_remove_json(doc_text: Column, segs: list[object]) -> Column:
    """Updated-JSON-text Column with the value at ``segs`` removed."""
    seg, rest = segs[0], segs[1:]

    def build(d: Column) -> Column:
        if isinstance(seg, int):
            arr = _guard_present(F.from_json(d, "array<variant>"))
            if rest:
                inner = _guard_present(F.to_json(F.element_at(arr, seg + 1)))
                nt = _deep_remove_json(inner, rest)
                return F.to_json(
                    F.concat(
                        F.slice(arr, 1, seg),
                        F.array(F.parse_json(nt)),
                        F.slice(arr, F.lit(seg + 2), F.size(arr)),
                    )
                )
            return F.to_json(
                F.concat(
                    F.slice(arr, 1, seg),
                    F.slice(arr, F.lit(seg + 2), F.size(arr)),
                )
            )
        if rest:
            inner = _guard_present(F.get_json_object(d, f"$.{seg}"))
            nt = _deep_remove_json(inner, rest)
            merged = F.map_concat(
                F.map_filter(
                    _guard_present(F.from_json(d, "map<string,variant>")),
                    lambda k, _v: k != seg,
                ),
                F.create_map(F.lit(seg), F.parse_json(nt)),
            )
            return _sorted_obj_json(merged)
        return _sorted_obj_json(
            F.map_filter(
                _guard_present(F.from_json(d, "map<string,variant>")),
                lambda k, _v: k != seg,
            )
        )

    return _bind(doc_text, build)


_NUM_RE = r"^-?[0-9]+(\.[0-9]+)?([eE][+-]?[0-9]+)?$"


def _render_num(total: Column) -> Column:
    """Render a double as JSON number text, integral values as ints."""
    as_long = total.cast("long")
    return F.when(
        as_long.cast("double") == total, as_long.cast("string")
    ).otherwise(total.cast("string"))


def _apply_deep_field(doc_text: Column, field: str, op: str, value) -> Column:
    """One deep-path op over a JSON-text document Column.

    Reference semantics per UpdateExpressionUtils: $SET replaces, $UNSET
    removes, $ADD is numeric-add (absent → addend) or set-union, and
    $DELETE_FROM_SET removes elements (absent field → no-op)."""
    return _bind(
        doc_text, lambda d: _apply_deep_field_bound(d, field, op, value)
    )


def _apply_deep_field_bound(doc_text: Column, field: str, op: str, value) -> Column:
    segs = _parse_bson_path(field)
    cur = F.get_json_object(doc_text, "$." + field)
    if op == "set":
        value = _unwrap_set(value)
        if (
            isinstance(value, dict)
            and set(value) == {"$ADD"}
            and isinstance(value["$ADD"], list)
            and len(value["$ADD"]) == 2
            and isinstance(value["$ADD"][0], str)
        ):
            # Bson3IT's in-place arithmetic SET form:
            #   {"$SET": {path: {"$ADD": [src_path, n]}}} — the new value is
            # the CURRENT value at src_path plus n
            src, addend = value["$ADD"]
            cur2 = F.get_json_object(doc_text, "$." + src)
            num = (
                F.when(cur2.isNull(), F.lit(0.0))
                .when(cur2.rlike(_NUM_RE), cur2.cast("double"))
                .otherwise(
                    F.raise_error(
                        F.lit(f"$SET $ADD: field {src!r} is not a number")
                    )
                )
            )
            return _deep_set_json(
                doc_text, segs, _render_num(num + F.lit(float(addend)))
            )
        return _deep_set_json(doc_text, segs, F.lit(_json.dumps(value)))
    if op == "unset":
        return _deep_remove_json(doc_text, segs)
    if op == "add":
        value = _unwrap_set(value)
        if isinstance(value, list):
            arr = F.from_json(cur, "array<variant>")
            texts = (
                F.when(cur.isNull(), F.lit([]).cast("array<string>"))
                .when(arr.isNotNull(), F.transform(arr, lambda e: F.to_json(e)))
                .otherwise(
                    F.raise_error(
                        F.lit(f"$ADD: field {field!r} is not a set")
                    )
                )
            )
            add_texts = [_json.dumps(_unwrap_set(v)) for v in value]
            fresh = F.filter(
                F.array_distinct(F.lit(add_texts).cast("array<string>")),
                lambda e: ~F.array_contains(texts, e),
            )
            new_text = F.concat(
                F.lit("["),
                F.concat_ws(",", F.array_sort(F.concat(texts, fresh))),
                F.lit("]"),
            )
            return _deep_set_json(doc_text, segs, new_text)
        if isinstance(value, bool) or not isinstance(value, (int, float)):
            raise BsonUpdateError("$ADD takes a number or a set")
        cur_num = (
            F.when(cur.isNull(), F.lit(0.0))
            .when(cur.rlike(_NUM_RE), cur.cast("double"))
            .otherwise(
                F.raise_error(F.lit(f"$ADD: field {field!r} is not a number"))
            )
        )
        return _deep_set_json(
            doc_text, segs, _render_num(cur_num + F.lit(float(value)))
        )
    # delete_from_set
    value = _unwrap_set(value)
    if not isinstance(value, list):
        raise BsonUpdateError("$DELETE_FROM_SET takes a set of values")
    arr = F.from_json(cur, "array<variant>")
    kept = F.array_sort(
        F.array_except(
            F.transform(arr, lambda e: F.to_json(e)),
            F.lit([_json.dumps(_unwrap_set(v)) for v in value]),
        )
    )
    new_text = F.concat(F.lit("["), F.concat_ws(",", kept), F.lit("]"))
    # Absent LEAF (parent present) → document unchanged; absent INTERMEDIATE
    # still raises via _deep_set_json's path guards, matching the reference's
    # updateNestedField contract.
    if len(segs) > 1:
        parent = F.get_json_object(doc_text, _jsonpath(segs[:-1]))
        noop = cur.isNull() & parent.isNotNull()
    else:
        noop = cur.isNull()
    return F.when(noop, doc_text).otherwise(
        _deep_set_json(doc_text, segs, new_text)
    )


def bson_update_expression(doc: Column | str, update_expr: str) -> Column:
    """Apply a Phoenix/DynamoDB-style update expression to a JSON document
    column, returning the updated document as JSON text with sorted keys
    (deterministic rendering; JSON object key order is not semantic).

    $ADD on a number adds to the existing value (absent → the addend, as in
    UpdateExpressionUtils.executeAddExpression); on an array it is set-union.
    $DELETE_FROM_SET removes the listed values.  Sets use canonical-JSON
    element identity.
    """
    if isinstance(doc, str):
        doc = F.col(doc)
    parsed = F.parse_json(doc)
    spec = _json.loads(update_expr)
    unknown = set(spec) - {"$SET", "$UNSET", "$ADD", "$DELETE_FROM_SET"}
    if unknown:
        raise BsonUpdateError(f"unsupported update operators: {sorted(unknown)}")
    set_m = {k: _unwrap_set(v) for k, v in spec.get("$SET", {}).items()}
    unset_m = spec.get("$UNSET", {})
    add_m = spec.get("$ADD", {})
    del_m = {k: _unwrap_set(v) for k, v in spec.get("$DELETE_FROM_SET", {}).items()}
    all_fields = set(set_m) | set(unset_m) | set(add_m) | set(del_m)
    deep = {f for f in all_fields if "." in f or "[" in f}
    fields = all_fields - deep
    # Ops chain per field in the reference's order SET → UNSET → ADD →
    # DELETE_FROM_SET (UpdateExpressionUtils.updateExpression:104-118), each
    # reading the previous op's result — folded here at plan time.  State per
    # field: ('orig',) = untouched document value, ('static', v) = known
    # literal, ('absent',) = removed, or a variant Column.
    touched: dict[str, Column] = {}
    removed: set[str] = set()
    _NUM_TYPES = ("TINYINT", "SMALLINT", "INT", "BIGINT", "DOUBLE", "FLOAT")
    for field in fields:
        # state becomes a Column only via $ADD (each op runs at most once per
        # field, in SET → UNSET → ADD → DELETE order), so ADD's input is
        # always orig/static/absent and DELETE's Column input is ADD's
        # output — col_kind records whether that output was a number or set.
        state: tuple | Column = ("orig",)
        col_kind: str | None = None
        if field in set_m:
            state = ("static", set_m[field])
        if field in unset_m:
            state = ("absent",)
        if field in add_m:
            addend = _unwrap_set(add_m[field])
            if isinstance(addend, bool) or not isinstance(
                addend, (int, float, list)
            ):
                raise BsonUpdateError("$ADD takes a number or a set")
            ex = F.try_variant_get(parsed, f"$.{field}", "variant")
            if isinstance(addend, list):
                add_texts = [_json.dumps(v) for v in addend]
                if _st(state, "orig"):
                    # absent → start empty; present non-array → runtime
                    # error, matching executeAddExpression's rejection
                    arr = F.try_variant_get(ex, "$", "array<variant>")
                    texts = (
                        F.when(ex.isNull(), F.lit([]).cast("array<string>"))
                        .when(
                            arr.isNotNull(),
                            F.transform(arr, lambda e: F.to_json(e)),
                        )
                        .otherwise(
                            F.raise_error(
                                F.lit(f"$ADD: field {field!r} is not a set")
                            )
                        )
                    )
                elif _st(state, "absent"):
                    texts = F.lit([]).cast("array<string>")
                else:  # static
                    if not isinstance(state[1], list):
                        raise BsonUpdateError("$ADD set over a non-set value")
                    texts = F.lit([_json.dumps(v) for v in state[1]])
                # append only NOT-already-present addend elements (the
                # reference's executeAddExpression contains-check): existing
                # duplicates in the stored array are preserved — array_union
                # would silently dedupe them
                fresh = F.filter(
                    F.array_distinct(F.lit(add_texts).cast("array<string>")),
                    lambda e: ~F.array_contains(texts, e),
                )
                state = _texts_to_variant(
                    F.array_sort(F.concat(texts, fresh))
                )
                col_kind = "set"
            else:
                if _st(state, "orig"):
                    # absent → 0; present non-number (string/bool/array/
                    # null) → runtime error, not a silent 0
                    tname = F.schema_of_variant(ex)
                    is_num = tname.isin(*_NUM_TYPES) | tname.startswith(
                        "DECIMAL"
                    )
                    cur = (
                        F.when(ex.isNull(), F.lit(0.0))
                        .when(is_num, F.try_variant_get(ex, "$", "double"))
                        .otherwise(
                            F.raise_error(
                                F.lit(
                                    f"$ADD: field {field!r} is not a number"
                                )
                            )
                        )
                    )
                elif _st(state, "absent"):
                    cur = F.lit(0.0)
                else:  # static
                    if isinstance(state[1], bool) or not isinstance(
                        state[1], (int, float)
                    ):
                        raise BsonUpdateError("$ADD number over a non-number")
                    cur = F.lit(float(state[1]))
                total = cur + F.lit(float(addend))
                # integral results render as ints (BsonInt32/64 math)
                as_long = total.cast("long")
                rendered = F.when(
                    as_long.cast("double") == total, as_long.cast("string")
                ).otherwise(total.cast("string"))
                state = F.parse_json(rendered)
                col_kind = "num"
        if field in del_m:
            values = del_m[field]
            if not isinstance(values, list):
                raise BsonUpdateError("$DELETE_FROM_SET takes a set of values")
            del_texts = [_json.dumps(v) for v in values]
            if isinstance(state, Column) and col_kind == "num":
                raise BsonUpdateError("$DELETE_FROM_SET over a non-set")
            if _st(state, "orig"):
                # absent → keep absent (SQL-NULL sentinel, filtered from the
                # final entries); present non-array → runtime error
                ex = F.try_variant_get(parsed, f"$.{field}", "variant")
                arr = F.try_variant_get(ex, "$", "array<variant>")
                kept = _texts_to_variant(
                    F.array_sort(
                        F.array_except(
                            F.transform(arr, lambda e: F.to_json(e)),
                            F.lit(del_texts),
                        )
                    )
                )
                state = (
                    F.when(ex.isNull(), F.lit(None).cast("variant"))
                    .when(arr.isNotNull(), kept)
                    .otherwise(
                        F.raise_error(
                            F.lit(f"$DELETE_FROM_SET: {field!r} is not a set")
                        )
                    )
                )
            elif _st(state, "absent"):
                state = ("absent",)
            elif _st(state, "static"):
                if not isinstance(state[1], list):
                    raise BsonUpdateError("$DELETE_FROM_SET over a non-set")
                state = _texts_to_variant(
                    F.array_sort(
                        F.array_except(
                            F.lit([_json.dumps(v) for v in state[1]]),
                            F.lit(del_texts),
                        )
                    )
                )
            else:  # Column from $ADD set
                state = _texts_to_variant(
                    F.array_sort(
                        F.array_except(_json_texts(state), F.lit(del_texts))
                    )
                )
        if _st(state, "orig"):
            continue
        removed.add(field)
        if _st(state, "absent"):
            continue
        touched[field] = (
            _variant_lit(state[1]) if _st(state, "static") else state
        )
    base = F.map_filter(
        F.from_json(doc, "map<string,variant>"),
        lambda k, _v: ~k.isin(*removed) if removed else F.lit(True),
    )
    out = base
    if touched:
        out = F.map_concat(
            base,
            F.map_from_arrays(
                F.array(*[F.lit(k) for k in touched]),
                F.array(*touched.values()),
            ),
        )
    # Drop SQL-NULL values: the keep-absent sentinel from $DELETE_FROM_SET
    # on a missing field.  (A document's own JSON nulls are variant VOID
    # values, never SQL NULL, so they survive.)  Then sort by key only — a
    # struct compare would try to order variant values.
    entries = F.array_sort(
        F.filter(F.map_entries(out), lambda e: e["value"].isNotNull()),
        lambda a, b: F.when(a["key"] < b["key"], -1)
        .when(a["key"] > b["key"], 1)
        .otherwise(0),
    )
    result = F.to_json(F.map_from_entries(entries))
    if deep:
        # Deep "." / "[n]" paths apply over the JSON text, one op class at a
        # time in the reference's SET → UNSET → ADD → DELETE order
        # (UpdateExpressionUtils.updateExpression:104-118); fields sorted for
        # a deterministic plan.
        for field in sorted(f for f in deep if f in set_m):
            result = _apply_deep_field(result, field, "set", set_m[field])
        for field in sorted(f for f in deep if f in unset_m):
            result = _apply_deep_field(result, field, "unset", None)
        for field in sorted(f for f in deep if f in add_m):
            result = _apply_deep_field(result, field, "add", add_m[field])
        for field in sorted(f for f in deep if f in del_m):
            result = _apply_deep_field(result, field, "delete", del_m[field])
    return result
