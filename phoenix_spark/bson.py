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
      | (?P<word>[A-Za-z_][\w.\[\]]*)
    )""",
    re.VERBOSE,
)

_KEYWORDS = {"AND", "OR", "NOT", "BETWEEN", "IN"}
_FUNCS = {
    "ATTRIBUTE_EXISTS",
    "ATTRIBUTE_NOT_EXISTS",
    "BEGINS_WITH",
    "CONTAINS",
    "SIZE",
    "FIELD_TYPE",
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


class _Parser:
    def __init__(self, doc: Column, text: str):
        self.doc = doc
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

    # path → extracted string value (None when absent)
    def _extract(self, path: str) -> Column:
        # a.b[0].c → $.a.b[0].c (JSONPath is also 0-based for arrays)
        return F.get_json_object(self.doc, f"$.{path}")

    def parse(self) -> Column:
        c = self._or()
        self.take("eof")
        return c

    def _or(self) -> Column:
        left = self._and()
        while self.peek()[0] == "OR":
            self.take()
            left = left | self._and()
        return left

    def _and(self) -> Column:
        left = self._not()
        while self.peek()[0] == "AND":
            self.take()
            left = left & self._not()
        return left

    def _not(self) -> Column:
        if self.peek()[0] == "NOT":
            self.take()
            return ~self._not()
        return self._primary()

    def _primary(self) -> Column:
        k, v = self.peek()
        if k == "lpar":
            self.take()
            c = self._or()
            self.take("rpar")
            return c
        if k == "word" and v.upper() in _FUNCS and self.toks[self.i + 1][0] == "lpar":
            return self._func_or_comparison()
        return self._comparison(self._operand())

    def _func_or_comparison(self) -> Column:
        _, name = self.take("word")
        up = name.upper()
        self.take("lpar")
        _, path = self.take("word")
        if up == "ATTRIBUTE_EXISTS":
            self.take("rpar")
            return self._extract(path).isNotNull()
        if up == "ATTRIBUTE_NOT_EXISTS":
            self.take("rpar")
            return self._extract(path).isNull()
        if up == "BEGINS_WITH":
            self.take("comma")
            lit = self._literal()
            self.take("rpar")
            return self._extract(path).startswith(lit)
        if up == "CONTAINS":
            self.take("comma")
            lit = self._literal()
            self.take("rpar")
            return self._extract(path).contains(lit)
        if up == "FIELD_TYPE":
            self.take("comma")
            lit = self._literal()
            self.take("rpar")
            v = self._extract(path)
            if lit == "N":
                return v.rlike(r"^-?[0-9]+(\.[0-9]+)?$")
            if lit == "S":
                return v.isNotNull() & ~v.rlike(r"^-?[0-9]+(\.[0-9]+)?$|^\[|^\{")
            if lit == "L":
                return v.startswith("[")
            if lit == "M":
                return v.startswith("{")
            raise BsonConditionError(f"unknown field type {lit!r}")
        if up == "SIZE":
            self.take("rpar")
            return self._comparison(F.length(self._extract(path)).cast("double"))
        raise BsonConditionError(f"unknown function {name}")

    def _operand(self) -> Column:
        k, v = self.peek()
        if k == "word":
            self.take()
            return self._extract(v)
        raise BsonConditionError(f"expected a document path, got {v!r}")

    def _literal(self):
        k, v = self.take()
        if k == "string":
            return v[1:-1].replace("''", "'")
        if k == "number":
            return float(v) if "." in v else int(v)
        raise BsonConditionError(f"expected a literal, got {v!r}")

    def _comparison(self, left: Column) -> Column:
        k, v = self.take()
        if k == "op":
            lit = self._literal()
            right = F.lit(lit)
            if isinstance(lit, (int, float)):
                left = left.cast("double")
                right = right.cast("double")
            return {
                "=": left == right,
                "<>": left != right,
                "!=": left != right,
                "<": left < right,
                "<=": left <= right,
                ">": left > right,
                ">=": left >= right,
            }[v]
        if k == "BETWEEN":
            lo = self._literal()
            self.take("AND")
            hi = self._literal()
            return left.cast("double").between(lo, hi)
        if k == "IN":
            self.take("lpar")
            lits = [self._literal()]
            while self.peek()[0] == "comma":
                self.take()
                lits.append(self._literal())
            self.take("rpar")
            if all(isinstance(x, (int, float)) for x in lits):
                return left.cast("double").isin(*[float(x) for x in lits])
            return left.isin(*lits)
        raise BsonConditionError(f"expected a comparison, got {v!r}")


def bson_condition(doc: Column | str, condition: str) -> Column:
    """Compile a BSON/DynamoDB-style condition expression into a Column
    predicate over a JSON document column."""
    if isinstance(doc, str):
        doc = F.col(doc)
    return _Parser(doc, condition).parse()
