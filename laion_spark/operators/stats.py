"""Blocked rank-correlation aggregates (SURVEY.md §2.17 G61).

Reference analog: ClickHouse ``kendallTau(x, y)`` — an aggregate
evaluated per GROUP BY group. This module computes the exact tau-b
(tie-corrected) form with the q103/t19 blocking discipline: pairs meet
through the block equi-key in a grouped self-join, never an all-pairs
cartesian, so the pair count is sum-of-m_b^2/2 over blocks instead of
n^2/2 — the shape that survives a 100 TB corpus when blocks are
bounded (per-entity series, per-category samples).

For ONE giant unblocked series the blocked design changes shape, not
cost class: cut y-value bands at quantile boundaries (equal values
share a band), then every cross-band pair's dy sign is known from the
band order and only within-band pairs need local counting —
O(n log n) total. That variant is documented here as the scale path;
the grouped form below is the aggregate users actually call.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def kendall_tau_b(
    df: DataFrame,
    x: str,
    y: str,
    block: str,
    id_col: str,
) -> DataFrame:
    """Exact Kendall tau-b per ``block``.

    Output, one row per block: ``(block, n_pairs, s_sum, ties_x,
    ties_y, tau_b)`` where ``s_sum`` = sum of sign(dx)*sign(dy) over
    the block's pairs, ``ties_x``/``ties_y`` count pairs tied on each
    axis, and ``tau_b = s_sum / sqrt((n_pairs - ties_x) * (n_pairs -
    ties_y))`` — NULL for degenerate blocks (all values tied on either
    axis, where tau-b is undefined).

    Every pair term is an exact integer, so the only float is the
    final quotient — callers needing cross-engine bit-stability (the
    q144 catalog entry) derive their own floored-micros form from the
    integer components this returns.

    ``id_col`` must be a unique key within each block: it provides the
    strict i<j pair enumeration (duplicated ids would silently drop
    pairs).
    """
    a = df.select(
        F.col(id_col).alias("_ka"), F.col(block).alias("_blk"),
        F.col(x).alias("_xa"), F.col(y).alias("_ya"),
    )
    b = df.select(
        F.col(id_col).alias("_kb"), F.col(block).alias("_blk"),
        F.col(x).alias("_xb"), F.col(y).alias("_yb"),
    )

    def sgn(u: str, v: str):
        return (
            F.when(F.col(u) > F.col(v), 1)
            .when(F.col(u) < F.col(v), -1)
            .otherwise(0)
        )

    pr = (
        a.join(b, ["_blk"])
        .filter(F.col("_ka") < F.col("_kb"))
        .select("_blk", sgn("_xb", "_xa").alias("_dx"), sgn("_yb", "_ya").alias("_dy"))
    )
    ag = pr.groupBy("_blk").agg(
        F.count("*").alias("n_pairs"),
        F.sum(F.col("_dx") * F.col("_dy")).alias("s_sum"),
        F.sum(F.when(F.col("_dx") == 0, 1).otherwise(0)).alias("ties_x"),
        F.sum(F.when(F.col("_dy") == 0, 1).otherwise(0)).alias("ties_y"),
    )
    cx = F.col("n_pairs") - F.col("ties_x")
    cy = F.col("n_pairs") - F.col("ties_y")
    return ag.select(
        F.col("_blk").alias(block),
        "n_pairs",
        "s_sum",
        "ties_x",
        "ties_y",
        F.when(
            (cx > 0) & (cy > 0),
            F.col("s_sum").cast("double") / F.sqrt((cx * cy).cast("double")),
        ).alias("tau_b"),
    )
