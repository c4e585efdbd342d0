"""Top-k vector search — the reference's canonical query (SURVEY.md V7).

Reference shape (search.py:20-35):
    SELECT url, caption, L2Distance(<emb>, <qvec>) AS score
    FROM <table> [WHERE <filter>] ORDER BY score ASC LIMIT <k>

Plan (both implementations share it):
    ParquetScan(pruned columns, pushed filters)
      -> Filter(<filter>)            # cheap predicate BELOW scoring
      -> score projection            # see impl note below
      -> TakeOrderedAndProject(k)    # per-partition top-k + k-row
                                     # reduce; NO global sort, NO
                                     # data-row shuffle
      -> Project(score = sqrt(s2))   # sqrt on the k survivors only

Implementation note (measured, not guessed — see BENCH): Catalyst's
higher-order array functions (``zip_with``/``aggregate``) are evaluated
interpreted, element-at-a-time with boxing — ~25k el/s/core at
dim=768, which is 3-4 orders of magnitude off the reference's
10-48M rows/s scan rate. So:

  - ``impl="arrow"`` (default for dim >= 32): an ``mapInArrow`` scorer
    — Arrow record batches flattened zero-copy into an (n x dim) numpy
    matrix, distances via BLAS-grade vectorized ops, (ids..., score)
    batches returned. Stays fully distributed and partition-local;
    the only cross-node traffic is the final k-row reduce. This is the
    100 TB path.
  - ``impl="hof"``: the pure-Catalyst expression path. Correctness
    twin for the oracle, and fine for small dims / column-expression
    composition (concept math over columns).

The monotonic-distance rewrite (sort on squared distance, sqrt after
the limit) and filter-before-score ordering are constructed here
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

_METRICS = {"l2", "cosine", "dot"}

#: dim at/above which the Arrow scorer wins (measured crossover is far
#: lower; 32 is conservative)
_ARROW_DIM_THRESHOLD = 32


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
    impl: str = "auto",
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
    cols = list(select) if select is not None else [c for c in df.columns if c != vector_col]

    is_literal_q = not isinstance(query_vec, Column)
    if impl == "auto":
        impl = "arrow" if (is_literal_q and len(query_vec) >= _ARROW_DIM_THRESHOLD) else "hof"
    if impl == "arrow" and not is_literal_q:
        raise ValueError("impl='arrow' requires a literal query vector")

    if impl == "arrow":
        scored = _arrow_scored(df, list(query_vec), vector_col, cols, metric)
    else:
        q = vec_lit(query_vec) if is_literal_q else query_vec
        if metric == "l2":
            raw = l2_distance_sq(F.col(vector_col), q)
        elif metric == "cosine":
            raw = cosine_similarity(F.col(vector_col), q)
        else:
            raw = dot(F.col(vector_col), q)
        scored = df.select(*cols, raw.alias("_raw"))

    if metric == "l2":
        order = [F.col("_raw").asc()]
        finish = F.sqrt(F.col("_raw"))
    else:
        order = [F.col("_raw").desc_nulls_last()]
        finish = F.col("_raw")
    order += [F.col(c).asc() for c in tiebreak]

    topk = scored.orderBy(*order).limit(k)
    return topk.withColumn(score_col, finish).drop("_raw")


def _arrow_scored(
    df: DataFrame,
    qvec: list[float],
    vector_col: str,
    cols: Sequence[str],
    metric: str,
) -> DataFrame:
    """Project (cols..., _raw) where _raw is the raw ordering score
    (squared L2 / cosine / dot) computed batch-wise in numpy.

    Partition-local, zero shuffle; Arrow list<float> values are
    flattened zero-copy into an (n, dim) matrix per batch.
    """
    import pyarrow as pa

    pruned = df.select(*cols, vector_col)
    out_fields = [pruned.schema[c] for c in cols]
    out_schema = (
        ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in out_fields) + ", _raw double"
        if out_fields
        else "_raw double"
    )
    dim = len(qvec)

    def score(batches):
        import numpy as np

        q = np.asarray(qvec, dtype=np.float64)
        qq = float(q @ q)
        for rb in batches:
            vcol = rb.column(rb.schema.get_field_index(vector_col))
            flat = vcol.flatten().to_numpy(zero_copy_only=False)
            n = len(vcol)
            if n == 0:
                continue
            mat = flat.reshape(n, dim).astype(np.float64, copy=False)
            if metric == "l2":
                # direct sum((a-q)^2): no cancellation (the expanded
                # ||a||^2-2aq+||q||^2 form drifts from the oracle's fold)
                d = mat - q
                raw = np.einsum("ij,ij->i", d, d)
            elif metric == "dot":
                raw = mat @ q
            else:  # cosine
                norms = np.sqrt(np.einsum("ij,ij->i", mat, mat)) * np.sqrt(qq)
                with np.errstate(divide="ignore", invalid="ignore"):
                    raw = np.where(norms != 0.0, (mat @ q) / norms, np.nan)
            arrays = [rb.column(rb.schema.get_field_index(c)) for c in cols]
            arrays.append(pa.array(raw, type=pa.float64()))
            yield pa.RecordBatch.from_arrays(arrays, list(cols) + ["_raw"])

    scored = pruned.mapInArrow(score, out_schema)
    if metric == "cosine":
        scored = scored.withColumn("_raw", F.when(~F.isnan("_raw"), F.col("_raw")))
    return scored


def topk_by_score(df: DataFrame, score: Column, k: int, ascending: bool = True, tiebreak: Sequence[str] = ()) -> DataFrame:
    """Generic top-k on a computed score — always TakeOrderedAndProject."""
    ordered = [score.asc() if ascending else score.desc()] + [F.col(c).asc() for c in tiebreak]
    return df.orderBy(*ordered).limit(k)
