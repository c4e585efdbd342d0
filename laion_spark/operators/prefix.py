"""Distributed global prefix (running) sum.

A global running sum is usually written as ``sum(x) OVER (ORDER BY k)``
— which Spark executes by moving EVERY row into one partition
(``Exchange SinglePartition``) and sorting there: the canonical
scale killer for an otherwise-parallel plan. ClickHouse meets the same
need with ``runningAccumulate`` over a sorted stream; the distributed
re-expression is the classic three-step:

1. ``repartitionByRange`` on the order key — partitions are globally
   ordered, rows sorted only within each;
2. per-partition running sum (a ``Window.partitionBy(partition)`` —
   no cross-partition traffic);
3. per-partition totals (one row per partition) collected, exclusive-
   scanned on the driver, and broadcast-joined back as offsets.

Every step is parallel; the only serial work is the O(#partitions)
offset scan. The driver-side collect is bounded by construction
(``num_partitions`` rows), the same contract style as
``knn_join.max_queries``.

Contract: ``order_cols`` must be a UNIQUE key of ``df`` (e.g. the
output of a groupBy on those columns). With duplicates, rows that
compare equal could land on either side of a partition boundary and a
ROWS-frame running sum would give them different prefixes — exactly
the tie hazard RANGE frames exist for. Callers with ties should
aggregate per key first (which is also the cheaper plan).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window as W, functions as F


def global_prefix_sum(
    df: DataFrame,
    order_cols: Sequence[str],
    value_col: str,
    out_col: str = "prefix_sum",
    exclusive: bool = True,
    num_partitions: int | None = None,
) -> DataFrame:
    """Add ``out_col`` = running sum of ``value_col`` in global
    ``order_cols`` order, without ever gathering the data onto one
    partition. ``exclusive=True`` (default) excludes the current row —
    the "count of strictly smaller" shape rank statistics need."""
    spark = df.sparkSession
    n = num_partitions or spark.sparkContext.defaultParallelism
    oc = [F.col(c) for c in order_cols]
    parts = df.repartitionByRange(n, *oc).withColumn("_pid", F.spark_partition_id())
    end = -1 if exclusive else 0
    w = W.partitionBy("_pid").orderBy(*oc).rowsBetween(W.unboundedPreceding, end)
    local = parts.withColumn("_local", F.coalesce(F.sum(value_col).over(w), F.lit(0)))

    totals = {
        r["_pid"]: r["_tot"]
        for r in parts.groupBy("_pid").agg(F.sum(value_col).alias("_tot")).collect()
    }
    is_int = dict(df.dtypes)[value_col] in ("tinyint", "smallint", "int", "bigint")
    run = 0 if is_int else 0.0
    offsets = []
    for pid in sorted(totals):
        offsets.append((pid, run))
        run += totals[pid] or 0
    off_df = spark.createDataFrame(
        offsets, f"_pid int, _off {'bigint' if is_int else 'double'}"
    )
    return (
        local.join(F.broadcast(off_df), "_pid")
        .withColumn(out_col, F.col("_local") + F.col("_off"))
        .drop("_pid", "_local", "_off")
    )
