"""Largest-Triangle-Three-Buckets downsampling (ClickHouse
``largestTriangleThreeBuckets(n)(x, y)``).

LTTB reduces a time series to ``n`` visually representative points:
the first and last points are kept; the interior is split into ``n-2``
equal-count buckets and each bucket contributes the point forming the
largest triangle with the PREVIOUSLY SELECTED point and the average of
the NEXT bucket (Steinarsson 2013, public thesis). The selection is
sequential — bucket ``i``'s choice depends on bucket ``i-1``'s — so it
is an aggregate over an ordered group, not a parallel map.

Spark realization: one shuffle on the series key, then a per-group
numpy pass inside ``applyInPandas``. Same contract as ClickHouse's
aggregate: ONE SERIES must fit in one task (the aggregate state is the
whole series); the group count provides the parallelism. At 100 TB
that holds — dashboards downsample per (metric, host, day) series,
and the group count is huge.

Cross-engine determinism (SURVEY §5.2) is engineered via an
integer-quantized scoring spec, identical in this implementation and
the DuckDB recursive-CTE oracle:

  - scan order: ascending (x, tiebreak) — ties in x cannot reorder;
  - ``xq = x - min(x)`` (exact int64), ``yq = floor(y * 1e6)`` (exact
    int64; floor has no rounding-mode ambiguity, unlike round);
  - the next-bucket anchor is kept as EXACT integer sums (Sx, Sy, c),
    never divided into a float average — the area comparison is scaled
    by c (a per-bucket positive constant, so argmax is unchanged):
    ``A = |dbl(px*c - Sx) * dbl(yc - py) - dbl(px - xc) * dbl(Sy - py*c)|``
    where every parenthesized term is exact int64 arithmetic and the
    two products run in IEEE float64 — both engines compute
    bit-identical A;
  - strict ``>`` while scanning, so the FIRST max wins area ties.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def lttb(
    df: DataFrame,
    x_col: str,
    y_col: str,
    n_out: int,
    group_by: str | list[str] | None = None,
    tiebreak: str | None = None,
) -> DataFrame:
    """Downsample each series to ``n_out`` points (all points when the
    series is already <= n_out long). Output columns: ``group_by`` +
    (x_col, y_col) + ``tiebreak`` if given; x ascending per series.

    ``x_col`` must be integer-typed (epoch micros is the canonical
    choice). If x can repeat within a series, pass a unique integer
    ``tiebreak`` column (an event id) — without one, equal-x ordering
    is engine-dependent and so is the output.
    """
    if n_out < 3:
        raise ValueError(f"lttb needs n_out >= 3 (first + last + >=1 bucket), got {n_out}")
    keys = [group_by] if isinstance(group_by, str) else list(group_by or [])
    sel = keys + [x_col, y_col] + ([tiebreak] if tiebreak else [])
    dts = dict(df.dtypes)
    if dts[x_col] not in ("bigint", "int", "smallint", "tinyint"):
        raise ValueError(
            f"x_col must be integer-typed for the exact-quantization spec, "
            f"got {x_col}: {dts[x_col]} — project epoch micros first"
        )
    schema = ", ".join(f"`{c}` {dts[c]}" for c in sel)
    order = [x_col] + ([tiebreak] if tiebreak else [])

    def pick(pdf):
        import numpy as np

        pdf = pdf.sort_values(order, kind="mergesort").reset_index(drop=True)
        n = len(pdf)
        if n <= n_out:
            return pdf[sel]
        x = pdf[x_col].to_numpy(dtype=np.int64)
        xq = x - x[0]
        yq = np.floor(pdf[y_col].to_numpy(dtype=np.float64) * 1e6).astype(np.int64)

        n_buckets = n_out - 2
        m = n - 2  # interior points 1..n-2; interior index j = i-1
        # point with interior index j lands in bucket j*n_buckets//m;
        # starts/ends are absolute row indices of each bucket
        bucket_of = (np.arange(m, dtype=np.int64) * n_buckets) // m
        starts = np.searchsorted(bucket_of, np.arange(n_buckets), side="left") + 1
        ends = np.searchsorted(bucket_of, np.arange(n_buckets), side="right") + 1

        chosen = [0]
        prev = 0
        for b in range(n_buckets):
            if b + 1 < n_buckets:
                s1, e1 = starts[b + 1], ends[b + 1]
                Sx = int(xq[s1:e1].sum())
                Sy = int(yq[s1:e1].sum())
                c = int(e1 - s1)
            else:
                Sx, Sy, c = int(xq[n - 1]), int(yq[n - 1]), 1
            s, e = starts[b], ends[b]
            px, py = int(xq[prev]), int(yq[prev])
            # exact int64 differences, then IEEE float64 products — the
            # literal formula the oracle replays
            t1 = np.float64(px * c - Sx) * (yq[s:e] - py).astype(np.float64)
            t2 = (px - xq[s:e]).astype(np.float64) * np.float64(Sy - py * c)
            area = np.abs(t1 - t2)
            best = s + int(np.argmax(area))  # argmax: FIRST max wins ties
            chosen.append(best)
            prev = best
        chosen.append(n - 1)
        return pdf.iloc[chosen][sel]

    if keys:
        out = df.select(*sel).groupBy(*keys).applyInPandas(pick, schema)
    else:
        out = (
            df.select(*sel)
            .withColumn("_g", F.lit(1))
            .groupBy("_g")
            .applyInPandas(lambda pdf: pick(pdf.drop(columns=["_g"])), schema)
        )
    return out
