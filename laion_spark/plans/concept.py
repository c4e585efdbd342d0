"""Concept-math expression compiler (SURVEY.md §2.4, reference
search.py:60-143 + embed_concept.py:10-56).

Grammar (semantics identical to the reference's pyparsing
infixNotation, search.py:125-143):

    operand  := word | 'quoted phrase' | integer
    term     := operand (('*' | '/') operand)*     # tighter binding
    expr     := term (('+' | '-') term)*           # left-assoc
    parenthesized sub-expressions allowed

Differences from the reference, both deliberate (SURVEY.md V4/E5):
  - scalar-on-LEFT works (``2 * dog``): the reference guards it with a
    raise at search.py:96-97, making its own left-scalar branch
    (search.py:98-99) unreachable;
  - error paths raise real exceptions (the reference's ``raise '<str>'``
    at search.py:90/94/97 is a TypeError at runtime).

Compilation strategy (SURVEY.md §3.2): leaves are encoded driver-side,
so in the common case the whole tree is literal and we CONSTANT-FOLD to
a single vector before the plan is built — the query vector enters
Catalyst as one array literal, evaluated once, never per row
(ClickHouse's optimizer performs the same fold server-side on the
reference's ``arrayMap(...)`` text). ``compile_concept`` also accepts
column leaves for the engine-side variant, emitting ``transform`` /
``zip_with`` expressions (V3-V5).

A scalar-only expression (e.g. ``2 * 3``) is rejected: the reference's
output contract is a vector (embedConcept returns Array(Float32)).
"""

from __future__ import annotations

import re
from collections.abc import Sequence

from pyspark.sql import Column, functions as F

from laion_spark.functions.vector import as_double, vec_lit

_TOKEN = re.compile(
    r"""\s*(?:
        (?P<lparen>\() |
        (?P<rparen>\)) |
        (?P<op>[+\-*/]) |
        (?P<int>\d+) |
        (?P<quoted>'[^']*') |
        (?P<word>[^\s()+\-*/']+)
    )""",
    re.VERBOSE,
)


class ConceptParseError(ValueError):
    """Malformed concept expression (reference: unbalanced/op errors at
    search.py:89-97, embed_concept.py:34-35 — fixed to real raises)."""


def _tokenize(text: str) -> list[tuple[str, str]]:
    pos, out = 0, []
    while pos < len(text):
        m = _TOKEN.match(text, pos)
        if not m or m.end() == m.start():
            raise ConceptParseError(f"cannot tokenize at {text[pos:pos+20]!r}")
        pos = m.end()
        for kind in ("lparen", "rparen", "op", "int", "quoted", "word"):
            v = m.group(kind)
            if v is not None:
                out.append((kind, v))
                break
    return out


# AST: ("num", int) | ("leaf", str) | ("binop", op, left, right)


def parse_concept(text: str):
    """Recursive-descent precedence parser producing the same shape the
    reference's pyparsing grammar yields: left-assoc binary groups,
    ``* /`` over ``+ -``."""
    if not text or not text.strip():
        raise ConceptParseError("empty expression")
    toks = _tokenize(text)
    i = 0

    def peek():
        return toks[i] if i < len(toks) else (None, None)

    def expect_operand():
        nonlocal i
        kind, v = peek()
        if kind == "lparen":
            i += 1
            node = expr()
            if peek()[0] != "rparen":
                raise ConceptParseError("unbalanced parentheses")
            i += 1
            return node
        if kind == "int":
            i += 1
            return ("num", int(v))
        if kind == "quoted":
            i += 1
            return ("leaf", v[1:-1])
        if kind == "word":
            i += 1
            return ("leaf", v)
        raise ConceptParseError(f"expected operand, got {v!r}")

    def term():
        nonlocal i
        node = expect_operand()
        while peek() == ("op", "*") or peek() == ("op", "/"):
            op = toks[i][1]
            i += 1
            node = ("binop", op, node, expect_operand())
        return node

    def expr():
        nonlocal i
        node = term()
        while peek() == ("op", "+") or peek() == ("op", "-"):
            op = toks[i][1]
            i += 1
            node = ("binop", op, node, term())
        return node

    ast = expr()
    if i != len(toks):
        raise ConceptParseError(f"trailing tokens at {toks[i]!r}")
    return ast


_OPS = {
    "+": lambda a, b: a + b,
    "-": lambda a, b: a - b,
    "*": lambda a, b: a * b,
    "/": lambda a, b: a / b,
}


def eval_concept(text: str, encoder) -> list[float]:
    """Constant-fold the whole expression to one vector (driver-side
    numpy-free fold; semantics of embed_concept.py:46-54 with the V4
    fix). Scalars broadcast over vectors on either side."""
    ast = parse_concept(text)

    def ev(node):
        if node[0] == "num":
            return float(node[1])
        if node[0] == "leaf":
            return [float(x) for x in encoder.encode(node[1])]
        _, op, l, r = node
        a, b = ev(l), ev(r)
        f = _OPS[op]
        if isinstance(a, float) and isinstance(b, float):
            return f(a, b)
        if isinstance(a, float):
            return [f(a, x) for x in b]
        if isinstance(b, float):
            return [f(x, b) for x in a]
        if len(a) != len(b):
            raise ConceptParseError("dimension mismatch in concept expression")
        return [f(x, y) for x, y in zip(a, b)]

    out = ev(ast)
    if isinstance(out, float):
        raise ConceptParseError("expression reduces to a scalar, not a vector")
    return out


def compile_concept(text: str, encoder, columns: dict[str, Column] | None = None) -> Column:
    """Compile to a Catalyst Column.

    ``columns`` maps leaf names to vector columns (engine-side variant,
    e.g. ``{'image': col('image_embedding')}``); unmapped leaves are
    encoded driver-side. If every leaf is literal the tree folds to a
    single ``vec_lit`` (the common search path — zero per-row work).
    """
    columns = columns or {}
    ast = parse_concept(text)

    def has_column(node) -> bool:
        if node[0] == "leaf":
            return node[1] in columns
        if node[0] == "binop":
            return has_column(node[2]) or has_column(node[3])
        return False

    if not has_column(ast):
        return vec_lit(eval_concept(text, encoder))

    def comp(node):
        # returns (kind, value): kind in {"scalar", "vec"}; vec is a Column
        if node[0] == "num":
            return ("scalar", float(node[1]))
        if node[0] == "leaf":
            if node[1] in columns:
                return ("vec", as_double(columns[node[1]]))
            return ("vec", vec_lit(encoder.encode(node[1])))
        _, op, l, r = node
        ka, a = comp(l)
        kb, b = comp(r)
        f = _OPS[op]
        if ka == "scalar" and kb == "scalar":
            return ("scalar", f(a, b))
        if ka == "scalar":
            return ("vec", F.transform(b, lambda x: f(F.lit(a), x)))
        if kb == "scalar":
            return ("vec", F.transform(a, lambda x: f(x, F.lit(b))))
        return ("vec", F.zip_with(a, b, lambda x, y: f(x, y)))

    kind, col = comp(ast)
    if kind != "vec":
        raise ConceptParseError("expression reduces to a scalar, not a vector")
    return col
