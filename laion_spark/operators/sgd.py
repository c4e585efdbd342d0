"""Iterative gradient-descent regression — ClickHouse
``stochasticLinearRegression`` re-expressed for Spark.

The reference's aggregate keeps (weights, lr) as aggregation state and
folds rows through it sequentially. The distributed re-expression is
full-batch gradient descent: each iteration is ONE algebraic
aggregation over the data (map-side combined, two numbers per
partition cross the shuffle) and the driver holds only the parameter
vector — the textbook data-parallel GD loop. k iterations = k passes;
at 100 TB you either sample the gradient data or accept k scans, both
standard.

Cross-engine determinism (so a DuckDB ``WITH RECURSIVE`` oracle can
replay the fit bit-for-bit): the per-row gradient terms are computed
with a fixed textual operation order, rounded to 9 dp, and summed
through ``DECIMAL(20,9)`` (order-independent); the parameter update
runs in IEEE double from identical inputs on both sides. By induction
every iteration's (w, b) is identical in both engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def sgd_linear_fit(
    df: DataFrame,
    x: Column,
    y: Column,
    lr: float = 0.5,
    iters: int = 8,
) -> tuple[float, float, int]:
    """Fit ``y ~ w*x + b`` by ``iters`` full-batch GD steps; returns
    (w, b, n). ``x``/``y`` should be pre-scaled to O(1) magnitudes —
    GD's usual conditioning requirement, and it keeps the rounded
    gradient terms well inside DECIMAL(20,9)."""
    if iters < 1:
        raise ValueError("iters must be >= 1")
    # NULL x or y rows carry no gradient information — drop them up
    # front so n and the gradient sums agree (counting them would
    # silently shrink every step; an all-NULL column would crash the
    # update with a None gradient)
    pair = df.select(x.alias("_x"), y.alias("_y")).where(
        F.col("_x").isNotNull() & F.col("_y").isNotNull()
    )
    w = b = 0.0
    n: int | None = None  # folded into the first gradient pass: k scans, not k+1
    dsum9 = lambda c: F.sum(c.cast("decimal(20,9)")).cast("double")  # noqa: E731
    for _ in range(iters):
        err = F.lit(w) * F.col("_x") + F.lit(b) - F.col("_y")
        aggs = [
            dsum9(F.round(err * F.col("_x"), 9)).alias("gw"),
            dsum9(F.round(err, 9)).alias("gb"),
        ]
        if n is None:
            aggs.append(F.count("*").alias("n"))
        row = pair.select(*aggs).collect()[0]
        if n is None:
            n = row["n"]
            if n == 0:
                raise ValueError("cannot fit on an empty (or all-NULL) DataFrame")
        w = w - lr * (2.0 / float(n)) * row["gw"]
        b = b - lr * (2.0 / float(n)) * row["gb"]
    return w, b, n
