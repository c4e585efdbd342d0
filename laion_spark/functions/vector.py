"""Vector / distance column functions — pure Catalyst higher-order
functions, no Python in the data path.

The reference's vector surface (SURVEY.md §2.3):
  - ``L2Distance(col, const_vec)``            (search.py:23)       -> l2_distance
  - ``arrayMap(x -> x <op> k, v)``            (search.py:100-101)  -> vec_scale / vec_shift
  - ``arrayMap((x,y) -> x <op> y, v1, v2)``   (search.py:103-104)  -> vec_add/sub/mul/div
Everything compiles to ``transform`` / ``zip_with`` / ``aggregate``
expressions, which Catalyst constant-folds over literal operands and
whole-stage-codegens over columns — no UDF, no Arrow hop, so a 100 TB
brute-force scan stays entirely JVM-side.

Scale notes:
  - distances are computed on ``double`` (inputs cast up; float storage
    is a compression knob, math precision is not).
  - ``l2_distance_sq`` exists because ``ORDER BY sqrt(s) LIMIT k`` ≡
    ``ORDER BY s LIMIT k`` (sqrt is monotonic) — top-k plans sort on
    the squared distance and apply sqrt to the k survivors only
    (SURVEY.md §4.2).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, functions as F

ColumnOrName = Column | str


def _c(col: ColumnOrName) -> Column:
    return F.col(col) if isinstance(col, str) else col


def vec_lit(vec: Sequence[float]) -> Column:
    """A constant vector as an array<double> literal column.

    The reference renders query vectors into SQL text (search.py:82);
    here the literal is a Catalyst array expression, which the
    optimizer folds once per query, not per row.
    """
    return F.array(*[F.lit(float(x)) for x in vec])


def as_double(col: ColumnOrName) -> Column:
    """Cast array<float> storage to array<double> for math."""
    return _c(col).cast("array<double>")


def dot(a: ColumnOrName, b: ColumnOrName) -> Column:
    """Inner product via zip_with + aggregate (codegen'd, no shuffle)."""
    return F.aggregate(
        F.zip_with(as_double(a), as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_distance_sq(a: ColumnOrName, b: ColumnOrName) -> Column:
    """Squared Euclidean distance Σ(aᵢ−bᵢ)² — the top-k sort key."""
    return F.aggregate(
        F.zip_with(as_double(a), as_double(b), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_distance(a: ColumnOrName, b: ColumnOrName) -> Column:
    """Euclidean distance — semantics of ClickHouse ``L2Distance``
    (reference usage: search.py:23)."""
    return F.sqrt(l2_distance_sq(a, b))


def l2_norm(a: ColumnOrName) -> Column:
    return F.sqrt(dot(a, a))


def cosine_similarity(a: ColumnOrName, b: ColumnOrName) -> Column:
    """dot(a,b) / (|a||b|); NULL when either norm is zero."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom != 0.0, dot(a, b) / denom)


def cosine_distance(a: ColumnOrName, b: ColumnOrName) -> Column:
    return F.lit(1.0) - cosine_similarity(a, b)


# --- elementwise vector arithmetic (reference arrayMap surface) -------------

def vec_add(a: ColumnOrName, b: ColumnOrName) -> Column:
    return F.zip_with(as_double(a), as_double(b), lambda x, y: x + y)


def vec_sub(a: ColumnOrName, b: ColumnOrName) -> Column:
    return F.zip_with(as_double(a), as_double(b), lambda x, y: x - y)


def vec_mul(a: ColumnOrName, b: ColumnOrName) -> Column:
    return F.zip_with(as_double(a), as_double(b), lambda x, y: x * y)


def vec_div(a: ColumnOrName, b: ColumnOrName) -> Column:
    return F.zip_with(as_double(a), as_double(b), lambda x, y: x / y)


def vec_scale(a: ColumnOrName, k: float | Column, op: str = "*") -> Column:
    """Scalar broadcast over a vector, scalar on either side.

    The reference implements scalar-on-right (search.py:100-101) and has
    an unreachable scalar-on-left branch (search.py:96-99, guarded by a
    raise); here both sides work (SURVEY.md V4 fix). ``op`` in + - * /.
    """
    kc = F.lit(float(k)) if not isinstance(k, Column) else k
    ops = {
        "+": lambda x: x + kc,
        "-": lambda x: x - kc,
        "*": lambda x: x * kc,
        "/": lambda x: x / kc,
    }
    rops = {
        "+": lambda x: kc + x,
        "-": lambda x: kc - x,
        "*": lambda x: kc * x,
        "/": lambda x: kc / x,
    }
    if op.startswith("r"):
        return F.transform(as_double(a), rops[op[1:]])
    return F.transform(as_double(a), ops[op])


def vec_shift(a: ColumnOrName, k: float | Column) -> Column:
    return vec_scale(a, k, "+")


def vec_normalize(a: ColumnOrName) -> Column:
    """Unit-normalize; NULL for zero vectors."""
    n = l2_norm(a)
    ad = as_double(a)
    return F.when(n != 0.0, F.transform(ad, lambda x: x / n))
