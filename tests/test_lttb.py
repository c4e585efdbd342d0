"""LTTB downsampling (operators/lttb.py): endpoint/bucket contracts,
tie determinism, and parity with an independent brute-force reference."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from laion_spark.operators.lttb import lttb


def brute_lttb(xs, ys, n_out):
    """Independent straight-from-the-thesis implementation (float
    averages, no quantization) — used for agreement-on-clear-winners
    parity, not bit-parity."""
    n = len(xs)
    if n <= n_out:
        return list(range(n))
    nb = n_out - 2
    m = n - 2
    # same equal-count bucketing rule as the spec (interior index j ->
    # bucket j*nb//m); what differs is the float-average arithmetic
    b_of = [(j * nb) // m for j in range(m)]
    bounds = [1 + b_of.index(b) for b in range(nb)] + [n - 1]
    chosen = [0]
    prev = 0
    for b in range(nb):
        s, e = bounds[b], bounds[b + 1]
        if b + 1 < nb:
            ax = sum(xs[bounds[b + 1] : bounds[b + 2]]) / (bounds[b + 2] - bounds[b + 1])
            ay = sum(ys[bounds[b + 1] : bounds[b + 2]]) / (bounds[b + 2] - bounds[b + 1])
        else:
            ax, ay = xs[n - 1], ys[n - 1]
        best, best_a = s, -1.0
        for i in range(s, e):
            a = abs(
                (xs[prev] - ax) * (ys[i] - ys[prev])
                - (xs[prev] - xs[i]) * (ay - ys[prev])
            )
            if a > best_a:
                best, best_a = i, a
        chosen.append(best)
        prev = best
    chosen.append(n - 1)
    return chosen


@pytest.fixture(scope="module")
def series(spark):
    rng = np.random.default_rng(7)
    rows = []
    for g in ("a", "b"):
        xs = np.cumsum(rng.integers(1, 1000, 400)) + 1_700_000_000_000_000
        ys = np.round(rng.normal(100, 25, 400), 4)
        rows += [(g, int(x), float(y), i) for i, (x, y) in enumerate(zip(xs, ys))]
    return spark.createDataFrame(rows, "g string, x long, y double, eid long")


def test_endpoints_and_count(series):
    out = lttb(series, "x", "y", 20, group_by="g", tiebreak="eid").collect()
    by_g = {}
    for r in out:
        by_g.setdefault(r.g, []).append(r)
    src = {g: sorted(rs, key=lambda r: r.x) for g, rs in by_g.items()}
    for g, rs in src.items():
        assert len(rs) == 20
        xs_all = [r.x for r in series.filter(F.col("g") == g).collect()]
        assert min(r.x for r in rs) == min(xs_all)  # first point kept
        assert max(r.x for r in rs) == max(xs_all)  # last point kept
        assert [r.x for r in rs] == sorted(r.x for r in rs)


def test_short_series_passthrough(series):
    short = series.filter(F.col("eid") < 5)
    out = lttb(short, "x", "y", 20, group_by="g", tiebreak="eid")
    assert out.count() == short.count()


def test_matches_brute_reference(series):
    """On smooth random data clear winners dominate; both the
    quantized spec and the float-average thesis algorithm must pick
    (nearly) the same points. Allow <=1 divergence per series for
    quantization-boundary cases."""
    out = lttb(series, "x", "y", 20, group_by="g", tiebreak="eid").collect()
    pdf = series.toPandas().sort_values(["g", "x", "eid"])
    for g in ("a", "b"):
        sub = pdf[pdf.g == g].reset_index(drop=True)
        idx = brute_lttb(sub.x.tolist(), sub.y.tolist(), 20)
        want = {int(sub.x[i]) for i in idx}
        got = {r.x for r in out if r.g == g}
        assert len(got - want) <= 1, (sorted(got - want), sorted(want - got))


def test_tie_first_point_wins(spark):
    """A flat series makes every area zero: strict > must keep the
    FIRST candidate of each bucket in (x, eid) order."""
    rows = [("g", 1_000_000 + i, 5.0, i) for i in range(40)]
    df = spark.createDataFrame(rows, "g string, x long, y double, eid long")
    out = sorted(r.x for r in lttb(df, "x", "y", 6, group_by="g", tiebreak="eid").collect())
    # buckets of interior points 1..38 (m=38, nb=4): starts at 1, 11, 20, 30
    assert out == [1_000_000, 1_000_001, 1_000_011, 1_000_020, 1_000_030, 1_000_039]


def test_requires_integer_x(spark):
    df = spark.createDataFrame([("g", 1.5, 2.0, 1)], "g string, x double, y double, eid long")
    with pytest.raises(ValueError, match="integer-typed"):
        lttb(df, "x", "y", 3, group_by="g")


def test_n_out_validation(series):
    with pytest.raises(ValueError, match="n_out >= 3"):
        lttb(series, "x", "y", 2, group_by="g")
