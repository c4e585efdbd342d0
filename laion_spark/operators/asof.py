"""Two-stream AS-OF join — ClickHouse ``ASOF JOIN`` (trade/quote
matching: each left row picks the latest right row at or before its
timestamp), re-expressed Spark-first.

The naive formulations both fail at scale: a range join explodes to
O(left x right-per-key) intermediate rows before its window dedup, and
a per-left-row subquery is a correlated nested loop. The Spark-native
shape is the UNION TRICK: tag both streams, union them (no join at
all), and run ONE window pass per key ordered by (ts, tag) carrying
the right stream's columns forward with ``last(ignorenulls=True)``.
One shuffle on the key, state = one right-row per key in the frame,
O(n log n) in the partition sort — the same merge-scan ClickHouse's
ASOF JOIN does, expressed declaratively.

Strictness is encoded in the tie-break tag: with ``strict`` (left.ts >
right.ts), a left row at the same timestamp sorts BEFORE the right row
and cannot see it; with non-strict (>=), after it and can.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window as W, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts_us",
    right_ts: str = "ts_us",
    right_cols: Sequence[str] = (),
    strict: bool = True,
    right_tiebreak: str | None = None,
) -> DataFrame:
    """For every left row: all left columns plus, for each requested
    right column c, ``c_asof`` = c from the latest right row with
    ``right.ts < left.ts`` (``<=`` when strict=False), matching on the
    equi-key ``on``. Left rows with no prior right row keep NULLs
    (ClickHouse ASOF LEFT JOIN semantics).

    When several right rows share the same (key, ts), which one wins is
    partition-order-dependent unless ``right_tiebreak`` names a right
    column made part of the window order — pass a unique-ish column
    (sequence number, id) to make tied right rows resolve
    deterministically (highest tie-break value wins, i.e. "latest").
    """
    right_cols = list(right_cols)
    lcols = left.columns
    # left rows carry NULL right-payload; right rows carry only payload
    l_tag = 0 if strict else 1
    tagged_l = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).cast("long").alias("_t"),
        F.lit(l_tag).alias("_tag"),
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"_r_{c}") for c in right_cols],
        F.lit(None).cast("long").alias("_tb"),
    )
    tagged_r = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).cast("long").alias("_t"),
        F.lit(1 - l_tag).alias("_tag"),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in lcols],
        *[F.col(c).alias(f"_r_{c}") for c in right_cols],
        (
            F.col(right_tiebreak).cast("long")
            if right_tiebreak is not None
            else F.lit(None).cast("long")
        ).alias("_tb"),
    )
    u = tagged_l.unionByName(tagged_r)
    # _tb only orders tied right rows among themselves (left/right never
    # share a _tag value); asc + last() => the highest tie-break wins
    w = (
        W.partitionBy("_k")
        .orderBy(F.col("_t").asc(), F.col("_tag").asc(), F.col("_tb").asc_nulls_first())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = u.select(
        "*",
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"{c}_asof")
            for c in right_cols
        ],
    )
    is_left = F.col("_tag") == F.lit(l_tag)
    return carried.filter(is_left).select(
        *lcols, *[f"{c}_asof" for c in right_cols]
    )
