"""MergeTree table-engine semantics as batch operators.

ClickHouse users lean on *table engines* to fold a mutable changelog
into its current state: ``ReplacingMergeTree`` keeps the newest version
of each key, ``CollapsingMergeTree`` cancels +1/-1 sign pairs, and
``SummingMergeTree`` pre-sums numeric columns per key. Background merges
apply these lazily; ``SELECT ... FINAL`` forces the fully-merged view.

Spark has no background-merge daemon, so here ``FINAL`` is an explicit
operator over the raw changelog (reference north star: the laion tables
are ClickHouse MergeTree tables; see reference search.py:20-35 for how
they are queried). Each function is one shuffle on the key columns and
scales linearly: the window/groupBy partial-aggregates map-side, no
driver state, no collect.

Determinism notes (SURVEY.md §5.2): ClickHouse keeps "the last row in
insertion order" among equal versions — insertion order does not exist
in a distributed scan, so every survivor pick here requires an explicit
total tie-break key, exactly like the d01 exact-dedup survivor.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window as W, functions as F


def replacing_final(
    df: DataFrame,
    keys: Sequence[str],
    version_col: str,
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """``ReplacingMergeTree(version) ... SELECT FINAL``: one surviving
    row per key — the one with the greatest ``version_col``, ties broken
    by ``tiebreak`` (greatest wins, matching ClickHouse's keep-last).

    One shuffle on ``keys``; ``row_number`` is WindowGroupLimit-eligible
    in Spark 4, so each partition keeps only its current winner.
    """
    order = [F.col(version_col).desc()] + [F.col(c).desc() for c in tiebreak]
    w = W.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def summing_final(
    df: DataFrame,
    keys: Sequence[str],
    sum_cols: Sequence[str],
) -> DataFrame:
    """``SummingMergeTree(sum_cols) ... SELECT FINAL``: per key, numeric
    ``sum_cols`` are summed and every other non-key column is dropped
    (ClickHouse keeps an *arbitrary* value for them — the deterministic
    twin keeps none, same declaration as the Q9 approx twin).

    Double columns accumulate as DECIMAL(18,6) so the result is exact
    and partition-order-independent; integral columns sum natively.
    """
    aggs: list[Column] = []
    for c in sum_cols:
        dt = dict(df.dtypes)[c]
        if dt in ("double", "float"):
            aggs.append(
                F.sum(F.col(c).cast("decimal(18,6)")).cast("double").alias(c)
            )
        else:
            aggs.append(F.sum(c).alias(c))
    return df.groupBy(*keys).agg(*aggs)


def collapsing_final(
    df: DataFrame,
    keys: Sequence[str],
    sign_col: str,
    order_col: str,
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """``CollapsingMergeTree(sign) ... SELECT FINAL``: +1 state rows and
    -1 cancel rows annihilate pairwise per key; a key survives iff its
    net sign is positive, represented by its most recent +1 row (by
    ``order_col`` then ``tiebreak``, greatest wins).

    Single shuffle on ``keys``: the net and the surviving row are both
    computed in one window pass (net via an unbounded frame, survivor
    via row_number over the +1 rows), then filtered — no self-join, no
    second shuffle.
    """
    order = [F.col(order_col).desc()] + [F.col(c).desc() for c in tiebreak]
    part = W.partitionBy(*keys)
    net = F.sum(sign_col).over(
        part.orderBy(*order).rowsBetween(
            W.unboundedPreceding, W.unboundedFollowing
        )
    )
    # +1 rows sort before -1 rows, so _rn == 1 lands on the most recent
    # state row whenever the key has any; the sign filter below discards
    # keys whose only rows are cancels.
    tagged = df.withColumn("_net", net).withColumn(
        "_rn",
        F.row_number().over(
            part.orderBy(
                F.when(F.col(sign_col) > 0, F.lit(0)).otherwise(F.lit(1)).asc(),
                *order,
            )
        ),
    )
    return (
        tagged.filter(
            (F.col("_net") > 0) & (F.col("_rn") == 1) & (F.col(sign_col) > 0)
        )
        .drop("_net", "_rn")
    )
