"""Mergeable aggregate state — the ClickHouse ``-State``/``-Merge``
combinator + AggregatingMergeTree pattern, re-expressed Spark-first
(SURVEY.md §2.8: the reference engine's incremental-materialized-view
machinery rests on exactly this algebra).

The idea: an aggregation over a huge table is decomposed into
*partial states* computed per shard/partition/day, persisted as an
ordinary table, and later *merged* — without touching the raw rows
again. Algebraic aggregates (count/sum/min/max) merge by
sum/sum/min/max of their states; avg derives from (sum, count);
distinct-count merges via HLL sketch union (Spark's Datasketches
``hll_sketch_agg`` / ``hll_union_agg`` — the analog of ClickHouse
``uniqCombinedState`` / ``uniqCombinedMerge``).

At 100 TB this is the difference between re-scanning a year of data
and merging 365 daily state rows per key: new data appends a state
partition; the read path merges states, never raw history. All
plans here are single-shuffle groupBys; state tables are ordinary
parquet, so the "materialized view" is just a partitioned table of
states.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F

#: state columns produced per measure m: m_count, m_sum, m_min, m_max
_ALGEBRAIC = ("count", "sum", "min", "max")


def agg_state(
    df: DataFrame,
    keys: Sequence[str],
    measures: Sequence[str],
    distinct_cols: Sequence[str] = (),
) -> DataFrame:
    """Partial-aggregate a shard into one mergeable state row per key.

    For each measure column m: ``m_count`` (non-null count), ``m_sum``
    (DECIMAL(28,6) — exact, so merge order can never drift the float
    result), ``m_min``, ``m_max``. For each distinct_col d: ``d_hll``,
    a Datasketches HLL sketch (binary, mergeable by union).
    """
    aggs = []
    for m in measures:
        aggs += [
            F.count(m).alias(f"{m}_count"),
            F.sum(F.col(m).cast("decimal(28,6)")).alias(f"{m}_sum"),
            F.min(m).alias(f"{m}_min"),
            F.max(m).alias(f"{m}_max"),
        ]
    for d in distinct_cols:
        aggs.append(F.hll_sketch_agg(d).alias(f"{d}_hll"))
    return df.groupBy(*keys).agg(*aggs)


def merge_states(
    states: DataFrame,
    keys: Sequence[str],
    measures: Sequence[str],
    distinct_cols: Sequence[str] = (),
) -> DataFrame:
    """Merge state rows (e.g. a union of per-shard / per-day state
    tables) into one state row per key. Merging is associative and
    commutative, so shards can arrive in any order, any grouping —
    the AggregatingMergeTree contract."""
    aggs = []
    for m in measures:
        aggs += [
            F.sum(f"{m}_count").alias(f"{m}_count"),
            F.sum(f"{m}_sum").alias(f"{m}_sum"),
            F.min(f"{m}_min").alias(f"{m}_min"),
            F.max(f"{m}_max").alias(f"{m}_max"),
        ]
    for d in distinct_cols:
        aggs.append(F.hll_union_agg(f"{d}_hll").alias(f"{d}_hll"))
    return states.groupBy(*keys).agg(*aggs)


def finalize(
    states: DataFrame,
    keys: Sequence[str],
    measures: Sequence[str],
    distinct_cols: Sequence[str] = (),
) -> DataFrame:
    """State -> final values: count, sum (double), avg, min, max per
    measure; approximate distinct count per sketch column."""
    cols = [F.col(k) for k in keys]
    for m in measures:
        cnt = F.col(f"{m}_count")
        s = F.col(f"{m}_sum").cast("double")
        cols += [
            cnt.alias(f"{m}_count"),
            s.alias(f"{m}_sum"),
            F.when(cnt > 0, s / cnt).alias(f"{m}_avg"),
            F.col(f"{m}_min").alias(f"{m}_min"),
            F.col(f"{m}_max").alias(f"{m}_max"),
        ]
    for d in distinct_cols:
        cols.append(F.hll_sketch_estimate(f"{d}_hll").alias(f"{d}_uniq"))
    return states.select(*cols)
