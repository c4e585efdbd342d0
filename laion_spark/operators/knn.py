"""Top-k vector search — the reference's canonical query (SURVEY.md V7).

Reference shape (search.py:20-35):
    SELECT url, caption, L2Distance(<emb>, <qvec>) AS score
    FROM <table> [WHERE <filter>] ORDER BY score ASC LIMIT <k>

Spark-first plan (what we build, and why it scales to 100 TB):
    ParquetScan(pruned columns, pushed filters)
      -> Filter(<filter>)                  # cheap predicate BELOW scoring
      -> Project(score2 = Σ(aᵢ-qᵢ)²)       # codegen'd HOF, no Python
      -> TakeOrderedAndProject(k)          # per-partition top-k + single
                                           # k-row reduce; NO global sort,
                                           # NO shuffle of data rows
      -> Project(score = sqrt(score2))     # sqrt on k survivors only

The monotonic-distance rewrite (sort on squared distance) and the
filter-before-score ordering are constructed here rather than left to
a custom optimizer rule — building the plan right costs nothing
(SURVEY.md §4.2).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F

from laion_spark.functions.vector import (
    cosine_similarity,
    dot,
    l2_distance_sq,
    vec_lit,
)

#: higher-is-better metrics sort descending
_METRICS = {"l2", "cosine", "dot"}


def knn_search(
    df: DataFrame,
    query_vec: Sequence[float] | Column,
    k: int = 10,
    vector_col: str = "image_embedding",
    filter: str | Column | None = None,
    select: Sequence[str] | None = None,
    metric: str = "l2",
    score_col: str = "score",
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Brute-force exact top-k nearest neighbors.

    ``tiebreak`` columns make the result total-ordered (needed for
    cross-engine comparison; the reference's ORDER BY score alone is
    ambiguous on ties).
    """
    if metric not in _METRICS:
        raise ValueError(f"metric must be one of {_METRICS}, got {metric!r}")
    if filter is not None:
        df = df.filter(filter)

    q = vec_lit(query_vec) if not isinstance(query_vec, Column) else query_vec
    cols = list(select) if select is not None else [c for c in df.columns if c != vector_col]

    if metric == "l2":
        raw = l2_distance_sq(F.col(vector_col), q)
        order = [F.col("_raw").asc()]
        finish = F.sqrt(F.col("_raw"))
    elif metric == "cosine":
        raw = cosine_similarity(F.col(vector_col), q)
        order = [F.col("_raw").desc_nulls_last()]
        finish = F.col("_raw")
    else:  # dot
        raw = dot(F.col(vector_col), q)
        order = [F.col("_raw").desc_nulls_last()]
        finish = F.col("_raw")

    order += [F.col(c).asc() for c in tiebreak]
    scored = df.select(*cols, raw.alias("_raw"))
    topk = scored.orderBy(*order).limit(k)
    return topk.withColumn(score_col, finish).drop("_raw")


def topk_by_score(df: DataFrame, score: Column, k: int, ascending: bool = True, tiebreak: Sequence[str] = ()) -> DataFrame:
    """Generic top-k on a computed score — always TakeOrderedAndProject."""
    ordered = [score.asc() if ascending else score.desc()] + [F.col(c).asc() for c in tiebreak]
    return df.orderBy(*ordered).limit(k)
