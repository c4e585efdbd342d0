"""Grouped custom aggregation (north-star U4, SURVEY.md §2.5).

The reference's UDF surface is scalar (executable line-protocol UDFs,
embed_text_function.xml:3-11); its aggregate surface is ClickHouse
built-ins. The engine-side analog of a *custom* aggregate is Spark's
grouped-map/grouped-agg Pandas API: full groups arrive as Arrow
batches, arbitrary Python computes one row (or a reduction) per group.

``grouped_centroid`` is the canonical instance — per-group embedding
centroid, reusable as the IVF fit step (operators/similarity.py) and
as a class prototype for labeled-corpus analysis.

Determinism contract (what makes this oracle-checkable cross-engine):
float summation order inside a group depends on partitioning, so the
UDF never sums floats. Elements are quantized to 1e-6 ints *in Spark*
(F.round is HALF_UP, matching DuckDB ``round``), the UDF does exact
int64 vector sums (associative — any arrival order gives identical
bits), and the final divide + round happens back in Spark. The pandas
UDF is pure integer math between two Catalyst projections.

Scale note: ``applyInPandas`` shuffles FULL groups to their executor —
right for genuinely non-algebraic aggregates, wasteful for algebraic
ones like a centroid (sum/count decompose). ``centroids_algebraic``
is the partial-aggregating twin (posexplode + SUM: map-side combine,
no group materialization) — at 100 TB prefer it; the applyInPandas
path is the U4 surface demonstration and the template for aggregates
that truly need the whole group in memory (medoids, trimmed means,
per-group model fits).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F

#: quantization scale: 1e-6 matches the engine-wide round(6) grain
_SCALE = 1_000_000


def _quantized(df: DataFrame, group_col: str, vector_col: str) -> DataFrame:
    q = F.transform(
        F.col(vector_col), lambda x: F.round(x.cast("double") * _SCALE, 0).cast("long")
    )
    return df.select(group_col, q.alias("_q"))


def grouped_centroid(
    df: DataFrame,
    group_col: str = "label",
    vector_col: str = "embedding",
    out_col: str = "centroid",
) -> DataFrame:
    """Per-group embedding centroid via ``applyInPandas`` (U4).

    Output: (group_col, n, out_col) — n = group size, out_col the
    elementwise mean rounded to 6 dp, deterministic across partitionings
    and engines (see module docstring).
    """
    gtype = df.schema[group_col].dataType.simpleString()

    def agg(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        mat = np.stack(pdf["_q"].to_numpy()).astype(np.int64)
        return pd.DataFrame(
            {
                group_col: [pdf[group_col].iloc[0]],
                "n": [len(pdf)],
                "_s": [mat.sum(axis=0).tolist()],  # exact: int64, associative
            }
        )

    sums = (
        _quantized(df, group_col, vector_col)
        .groupBy(group_col)
        .applyInPandas(agg, f"`{group_col}` {gtype}, n long, _s array<long>")
    )
    cent = F.transform(F.col("_s"), lambda s: F.round(s / (F.col("n") * F.lit(float(_SCALE))), 6))
    return sums.select(group_col, "n", cent.alias(out_col)).orderBy(group_col)


def centroid_grouped_agg(
    df: DataFrame,
    group_col: str = "label",
    vector_col: str = "embedding",
    out_col: str = "centroid",
) -> DataFrame:
    """The GROUPED_AGG ``pandas_udf`` form of ``grouped_centroid`` —
    a custom aggregate usable directly inside ``groupBy().agg(...)``
    next to built-ins (count, max, ...), same exact-int64 contract.
    Unlike built-in aggregates it has no partial aggregation (whole
    groups shuffle), so prefer ``centroids_algebraic`` at scale."""
    from pyspark.sql import types as T

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def vec_sum(q: pd.Series) -> list:
        import numpy as np

        return np.stack(q.to_numpy()).astype(np.int64).sum(axis=0).tolist()

    # Spark disallows mixing a GROUPED_AGG pandas UDF with non-pandas
    # aggregates in one agg(), so the count is a pandas UDF too
    @F.pandas_udf(T.LongType())
    def pcount(q: pd.Series) -> int:
        return len(q)

    sums = (
        _quantized(df, group_col, vector_col)
        .groupBy(group_col)
        .agg(pcount("_q").alias("n"), vec_sum("_q").alias("_s"))
    )
    cent = F.transform(F.col("_s"), lambda s: F.round(s / (F.col("n") * F.lit(float(_SCALE))), 6))
    return sums.select(group_col, "n", cent.alias(out_col)).orderBy(group_col)


def centroids_algebraic(
    df: DataFrame,
    group_col: str = "label",
    vector_col: str = "embedding",
    out_col: str = "centroid",
) -> DataFrame:
    """The scale twin: identical output via posexplode + exact SUM —
    partial aggregation (map-side combine), no full-group shuffle."""
    ex = _quantized(df, group_col, vector_col).select(
        group_col, F.posexplode("_q").alias("pos", "v")
    )
    per = ex.groupBy(group_col, "pos").agg(F.sum("v").alias("s"), F.count("*").alias("n"))
    rows = per.groupBy(group_col).agg(
        F.max("n").alias("n"),
        F.array_sort(F.collect_list(F.struct("pos", "s"))).alias("ps"),
    )
    cent = F.transform(F.col("ps"), lambda e: F.round(e["s"] / (F.col("n") * F.lit(float(_SCALE))), 6))
    return rows.select(group_col, "n", cent.alias(out_col)).orderBy(group_col)


def centroids_exploded(
    df: DataFrame,
    group_col: str = "label",
    vector_col: str = "embedding",
) -> DataFrame:
    """``centroids_algebraic`` flattened to ``(group, n, pos, value)``
    rows — one row per centroid element, 0-based ``pos``.

    This is the catalog/driver surface for U4: scalar columns only
    (array outputs break hash-canonicalizers that sort result frames),
    and the plan is a single (group, pos) hash aggregate with map-side
    combine — no full-group shuffle, no per-group array materialization.
    At 100 TB this is the form to use."""
    ex = _quantized(df, group_col, vector_col).select(
        group_col, F.posexplode("_q").alias("pos", "v")
    )
    per = ex.groupBy(group_col, "pos").agg(F.sum("v").alias("s"), F.count("*").alias("n"))
    return per.select(
        group_col,
        "n",
        "pos",
        F.round(F.col("s") / (F.col("n") * F.lit(float(_SCALE))), 6).alias("value"),
    ).orderBy(group_col, "pos")


def weighted_quantile(
    df,
    keys,
    value_col: str,
    weight_col,
    q_num: int = 1,
    q_den: int = 2,
):
    """Exact weighted quantile per group (ClickHouse
    ``quantileExactWeighted``): the smallest value v whose cumulative
    weight reaches q of the group's total weight.

    The quantile threshold is compared in INTEGER arithmetic
    (``q_den * cum >= q_num * tot`` with long weights) — no float
    boundary, so Spark and any SQL oracle agree bit-for-bit, which a
    ``cum >= 0.5 * tot`` float compare cannot promise when a cumsum
    lands exactly on the threshold.

    Plan shape: pre-aggregate (keys, value) -> weight (collapses
    duplicate values so window RANGE-frame peer semantics can never
    differ across engines), one window cumsum over the value order,
    then a min-per-group. Two shuffles: the grouping one hashes on
    (keys, value) — map-side combine shrinks it to one row per
    distinct value — and the window one re-hashes the already-reduced
    rows on keys alone, so only distinct-value rows ever move twice.
    """
    from pyspark.sql import Window as W, functions as F

    wcol = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    g = df.groupBy(*keys, value_col).agg(F.sum(wcol.cast("long")).alias("_w"))
    win = W.partitionBy(*keys).orderBy(value_col)
    cum = F.sum("_w").over(win)
    tot = F.sum("_w").over(W.partitionBy(*keys))
    return (
        g.withColumn("_cum", cum)
        .withColumn("_tot", tot)
        .filter(F.lit(int(q_den)) * F.col("_cum") >= F.lit(int(q_num)) * F.col("_tot"))
        .groupBy(*keys)
        .agg(F.min(value_col).alias(f"{value_col}_wq"))
    )
