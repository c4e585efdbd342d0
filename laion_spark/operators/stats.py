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
            # cast BEFORE multiplying: cx*cy in long arithmetic wraps
            # past ~9.2e18 (blocks of ~78k+ rows); the double product is
            # correctly rounded at any block size (ADVICE r10)
            F.col("s_sum").cast("double")
            / F.sqrt(cx.cast("double") * cy.cast("double")),
        ).alias("tau_b"),
    )


def _count_discordant_local(xs, ys) -> int:
    """Strictly-discordant pair count #{(i,j): x_i < x_j, y_i > y_j}
    over ONE in-memory stripe, O(m log m): process rows in increasing
    x, batching equal-x groups (their pairs are x-tied, never
    discordant), and Fenwick-count already-seen rows with strictly
    larger y."""
    import numpy as np

    m = len(xs)
    if m < 2:
        return 0
    xs = np.asarray(xs)
    ys = np.asarray(ys)
    order = np.lexsort((ys, xs))  # by x, then y (y-order irrelevant)
    xs, ys = xs[order], ys[order]
    # compress y to 1..R ranks for the Fenwick tree
    uy = np.unique(ys)
    ry = np.searchsorted(uy, ys) + 1
    R = len(uy)
    tree = [0] * (R + 1)

    def add(i):
        while i <= R:
            tree[i] += 1
            i += i & (-i)

    def prefix(i):  # count of inserted with rank <= i
        s = 0
        while i > 0:
            s += tree[i]
            i -= i & (-i)
        return s

    d = 0
    seen = 0
    lo = 0
    while lo < m:
        hi = lo
        while hi < m and xs[hi] == xs[lo]:
            hi += 1
        # query the whole equal-x batch against PRIOR insertions only
        for j in range(lo, hi):
            d += seen - prefix(ry[j])  # inserted with y > y_j
        for j in range(lo, hi):
            add(ry[j])
        seen += hi - lo
        lo = hi
    return int(d)


def _auto_bands(n: int, target_stripe: int = 5_000_000, floor: int = 32) -> int:
    """Band count for an n-row series: one x-stripe (the largest thing
    a single applyInPandas task materializes) should hold roughly
    ``target_stripe`` rows, so the stripe's pandas frame stays ~100 MB
    at two 8-byte columns. Grows linearly with n (10^9 rows -> 200
    bands) while the driver-side cell grid stays tiny (bands^2 longs).
    """
    import math

    return max(floor, math.ceil(n / target_stripe))


def kendall_tau_b_series(
    df: DataFrame,
    x: str,
    y: str,
    bands: int | None = None,
) -> DataFrame:
    """Exact Kendall tau-b over ONE numeric series — the scale path for
    an unblocked corpus-wide correlation, with NO O(n^2) pair step
    anywhere (SURVEY §2.17 G61's banded design, implemented).

    Decomposition: rows are cut into x-bands and y-bands at
    approxQuantile boundaries (assignment is BY VALUE — equal values
    always share a band — so band inequality implies strict value
    inequality). The discordant-pair count D then splits exactly into

    - cross-band cells: for cell pairs with xband_1 < xband_2 AND
      yband_1 > yband_2, EVERY cross pair is discordant — a dominance
      double-sum over the <= bands^2 aggregated cell counts (driver
      arithmetic on a tiny grid);
    - same-x-band pairs: resolved exactly inside each x-stripe
      (applyInPandas, O(m log m) Fenwick per stripe);
    - same-y-band / different-x-band pairs: resolved inside each
      y-stripe with the SAME kernel on (xband, y) — different x-band
      already implies strict x order.

    The three terms are disjoint and complete, so D is exact; band
    boundaries affect only the work split, never the result (any
    banding gives the same D). Ties enter through exact group counts
    (sum c*(c-1)/2 per x / y / (x,y) value), S = comparable - 2D, and
    tau_b = S / sqrt((n0-n1)(n0-n2)).

    Shuffle profile: three map-side-combinable aggregates + two
    repartitions by band + one tiny cell aggregate — one stripe's rows
    (~n/bands) is the largest thing any task holds. ``bands`` defaults
    to ``_auto_bands(n)`` (~n/5M, floor 32) so a stripe's pandas frame
    is bounded regardless of series size; pass it explicitly only to
    pin the work split (the result never depends on banding). Output:
    one row (n_rows, n_pairs, ties_x, ties_y, ties_xy, comparable,
    discordant, s_sum, tau_b).

    Integral inputs stay LONG end-to-end (tie grouping, stripe
    comparisons): a double cast would collapse distinct int64 values
    beyond 2^53 into false ties (ADVICE r10). Band boundaries compare
    through double, which is safe — long->double is monotone, so band
    inequality still implies strict value inequality; at worst two huge
    near-equal values share a band and resolve exactly in the stripe.
    """
    from pyspark.sql.types import ByteType, IntegerType, LongType, ShortType

    spark = df.sparkSession

    def lossless(col: str) -> str:
        dt = df.schema[col].dataType
        return "long" if isinstance(dt, (ByteType, ShortType, IntegerType, LongType)) else "double"

    pts = df.select(
        F.col(x).cast(lossless(x)).alias("_x"),
        F.col(y).cast(lossless(y)).alias("_y"),
    ).where(F.col(x).isNotNull() & F.col(y).isNotNull())

    def tie_pairs(col: str):
        g = pts.groupBy(col).count()
        return g.agg(
            F.coalesce(F.sum(F.col("count") * (F.col("count") - 1)), F.lit(0)).alias("t")
        ).collect()[0][0] // 2

    n = pts.count()
    if bands is None:
        bands = _auto_bands(n)
    if n < 2:
        return spark.createDataFrame(
            [(n, 0, 0, 0, 0, 0, 0, 0, None)],
            "n_rows long, n_pairs long, ties_x long, ties_y long, ties_xy long, "
            "comparable long, discordant long, s_sum long, tau_b double",
        )
    n1 = tie_pairs("_x")
    n2 = tie_pairs("_y")
    n3 = (
        pts.groupBy("_x", "_y").count()
        .agg(F.coalesce(F.sum(F.col("count") * (F.col("count") - 1)), F.lit(0)))
        .collect()[0][0] // 2
    )
    n0 = n * (n - 1) // 2
    comparable = n0 - n1 - n2 + n3

    # value-based band assignment: band = #boundaries strictly below
    # the value, so equal values always land together and band order
    # implies strict value order. Boundary quality only balances work.
    def band_col(col: str, bounds: list):
        arr = F.array(*[F.lit(float(b)) for b in bounds])
        return F.size(F.filter(arr, lambda b: F.col(col) > b))

    probes = [i / bands for i in range(1, bands)]
    xb_bounds = sorted(set(pts.stat.approxQuantile("_x", probes, 0.001)))
    yb_bounds = sorted(set(pts.stat.approxQuantile("_y", probes, 0.001)))
    banded = pts.select(
        "_x", "_y",
        band_col("_x", xb_bounds).alias("_xb"),
        band_col("_y", yb_bounds).alias("_yb"),
    )

    # term 1: strict cross-band dominance over the aggregated grid
    cells = banded.groupBy("_xb", "_yb").count().collect()
    import numpy as np

    d_cells = 0
    for xb1, yb1, c1 in [(r[0], r[1], r[2]) for r in cells]:
        for xb2, yb2, c2 in [(r[0], r[1], r[2]) for r in cells]:
            if xb1 < xb2 and yb1 > yb2:
                d_cells += c1 * c2

    from laion_spark.session import _ship_package

    _ship_package(spark)

    def stripe_counter(xcol: str, ycol: str):
        def count(pdf):
            import pandas as pd

            d = _count_discordant_local(pdf[xcol].to_numpy(), pdf[ycol].to_numpy())
            return pd.DataFrame({"d": [d]})

        return count

    d_x = (
        banded.groupBy("_xb")
        .applyInPandas(stripe_counter("_x", "_y"), "d long")
        .agg(F.coalesce(F.sum("d"), F.lit(0)))
        .collect()[0][0]
    )
    # same-y-band, different-x-band: the kernel's strict x comparison on
    # the BAND id excludes same-x-band pairs (already counted in d_x)
    d_y = (
        banded.groupBy("_yb")
        .applyInPandas(stripe_counter("_xb", "_y"), "d long")
        .agg(F.coalesce(F.sum("d"), F.lit(0)))
        .collect()[0][0]
    )
    d = int(d_cells) + int(d_x) + int(d_y)
    s = comparable - 2 * d
    cx, cy = n0 - n1, n0 - n2
    import math

    tau = s / math.sqrt(cx * cy) if cx > 0 and cy > 0 else None
    return spark.createDataFrame(
        [(n, n0, n1, n2, n3, comparable, d, s, tau)],
        "n_rows long, n_pairs long, ties_x long, ties_y long, ties_xy long, "
        "comparable long, discordant long, s_sum long, tau_b double",
    )
