"""Approximate heavy hitters — ClickHouse ``topK``/``topKWeighted``
parity (SpaceSaving, Metwally et al. 2005), re-expressed Spark-first.

Shape: map-side SpaceSaving sketch per partition (``mapInPandas`` —
bounded memory: ``capacity`` counters regardless of stream length),
then one tiny shuffle of ``partitions x capacity`` counter rows merged
by key, then a k-row TakeOrdered. The raw data shuffles ZERO rows —
only sketch counters move, which is what makes this viable at 100 TB
where an exact groupBy of a high-cardinality key would shuffle the
whole table.

Guarantees (standard SpaceSaving, per partition): every counter is an
upper bound on the item's true in-partition count, ``count - err`` a
lower bound, and any item with true count > n/capacity is present in
the sketch. After the merge, ``estimate = sum(present counts)`` keeps
the heavy-hitter recall property; when ``capacity`` >= the number of
distinct items seen by each partition no eviction ever happens,
``err = 0``, and the result is EXACT (the catalog oracle runs in that
regime; the approximate regime is pinned by a skew recall test).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def topk_approx(
    df: DataFrame,
    col: str,
    k: int = 10,
    capacity: int = 4096,
    weight_col: str | None = None,
) -> DataFrame:
    """Top-k items of ``df[col]`` by approximate count — or, with
    ``weight_col``, by approximate weight sum (ClickHouse
    ``topKWeighted``; weights are cast to non-negative BIGINT, matching
    its UInt64 contract, so the exact-regime result stays integer).

    Returns (item, n, err) ordered by n desc, item asc — ``n`` is the
    merged estimate (exact when no partition evicted), ``err`` the
    summed eviction over-count bound (0 => n is exact).
    """
    from laion_spark.session import _ship_package

    _ship_package(df.sparkSession)
    cap = int(capacity)
    cols = [F.col(col).cast("string").alias("_item")]
    if weight_col is not None:
        # clamp to the documented non-negative UInt64 contract — a
        # negative weight would silently break SpaceSaving's invariants
        # (counters stop being upper bounds, min-victim eviction lies)
        cols.append(
            F.greatest(F.col(weight_col).cast("long"), F.lit(0)).alias("_w")
        )
    src = df.select(*cols).filter(F.col("_item").isNotNull())

    def sketch(batches):
        import pandas as pd

        counters: dict[str, list[int]] = {}  # item -> [count, err]
        for pdf in batches:
            # vectorized per-batch counting; the SpaceSaving loop runs
            # per UNIQUE item per batch, not per row
            if "_w" in pdf.columns:
                per_item = pdf.groupby("_item")["_w"].sum()
            else:
                per_item = pdf["_item"].value_counts()
            for item, c in per_item.items():
                c = int(c)
                if item in counters:
                    counters[item][0] += c
                elif len(counters) < cap:
                    counters[item] = [c, 0]
                else:
                    victim = min(counters, key=lambda x: counters[x][0])
                    floor = counters.pop(victim)[0]
                    counters[item] = [floor + c, floor]
        if counters:
            yield pd.DataFrame(
                {
                    "_item": list(counters),
                    "_n": [v[0] for v in counters.values()],
                    "_err": [v[1] for v in counters.values()],
                }
            )

    partials = src.mapInPandas(sketch, "_item string, _n long, _err long")
    merged = partials.groupBy("_item").agg(
        F.sum("_n").alias("n"), F.sum("_err").alias("err")
    )
    return (
        merged.select(F.col("_item").alias("item"), "n", "err")
        .orderBy(F.col("n").desc(), F.col("item").asc())
        .limit(k)
    )
