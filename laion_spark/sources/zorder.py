"""Z-order (morton) clustered parquet layout — multi-dimensional data
skipping for the 100 TB posture (SURVEY.md §2.17 G15/G21; reference
north star: ClickHouse ``ORDER BY mortonEncode(a, b)`` clustering, the
Delta/Iceberg ``OPTIMIZE ZORDER BY`` analog).

A single-column sort layout (``sources/minmax.py`` discipline) makes
footer min/max pruning surgical on ONE column and useless on every
other. Interleaving the bits of two (or more) quantized columns into a
morton key and range-partitioning on THAT gives every file a small
contiguous Z-curve range — i.e. a small rectangle-ish region of the
multi-dimensional key space — so the per-file footer [min, max] of
EACH original column is narrow and file skipping works for predicates
on ANY of the clustered columns, from the same single layout.

Everything here is plain DataFrame machinery:

    quantize:   exact integer arithmetic onto [0, 2^bits)
    zorder_key: unrolled shift/AND interleave (pure JVM codegen,
                the same expression family as catalog q116/q120)
    write:      repartitionByRange(zkey) + sortWithinPartitions(zkey)
    scan:       footer-stats file pruning on the ORIGINAL columns
                (conjunction over per-column ranges), residual filter
                pushed down inside surviving files

The pruning decision is conservative — files lacking stats for any
queried column are kept — so results never depend on the statistics.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from laion_spark.sources.minmax import _file_key_range


def quantize(col: Column | str, lo: int, hi: int, bits: int = 16) -> Column:
    """Map an integer-valued column from [lo, hi] onto [0, 2^bits) with
    exact integer arithmetic (clamped at the edges; no float rounding
    enters the key)."""
    c = F.col(col) if isinstance(col, str) else col
    if hi < lo:
        raise ValueError(f"quantize needs lo <= hi; got lo={lo}, hi={hi}")
    c = F.greatest(F.lit(lo), F.least(F.lit(hi), c)).cast("long")
    span = hi - lo + 1
    if span * (1 << bits) > (1 << 63) - 1:
        raise ValueError(
            f"quantize needs (hi-lo+1)*2^bits inside a signed long; "
            f"span={span} at bits={bits} overflows — lower bits or "
            f"pre-scale the column"
        )
    # (c - lo) * 2^bits is exact in long arithmetic; IntegralDivide
    # (SQL `div`) keeps the whole key integral end to end. A float `/`
    # inside floor() would round near 2^53 and could emit exactly
    # 2^bits for the max value; (span-1)*2^bits DIV span is provably
    # < 2^bits for any span, so the declared [0, 2^bits) range holds.
    scaled = (c - F.lit(lo)) * F.lit(1 << bits).cast("long")
    return F.call_function("div", scaled, F.lit(span).cast("long"))


def zorder_key(cols: list[Column], bits: int = 16) -> Column:
    """Bit-interleave already-quantized columns (each in [0, 2^bits))
    into one morton key. Column j contributes bit i to output position
    ``i * len(cols) + j`` — the classic Z-curve for any arity. Pure
    shift/AND expression unrolling; stays in whole-stage codegen.
    Requires ``bits * len(cols) <= 63`` so the key never touches the
    long sign bit."""
    n = len(cols)
    if bits * n > 63:
        raise ValueError(
            f"zorder_key needs bits*len(cols) <= 63 to stay inside a "
            f"signed long; got bits={bits} x {n} cols = {bits * n}"
        )
    out = F.lit(0).cast("long")
    for j, c in enumerate(cols):
        c = c.cast("long")
        for i in range(bits):
            out = out + F.shiftleft(
                F.shiftright(c, i).bitwiseAND(F.lit(1)), i * n + j
            )
    return out


def write_zordered(
    df: DataFrame,
    specs: list[tuple[str, int, int]],
    path: str,
    files: int = 16,
    bits: int = 8,
) -> None:
    """Write ``df`` as parquet clustered on the Z-curve of the given
    ``(column, lo, hi)`` specs. ``files`` range-partitions bound the
    per-file Z-range; within-file sort keeps row groups aligned with
    the curve so row-group-level stats stay narrow too. At cluster
    scale this is one range-exchange — the same single shuffle any
    ORDER BY write discipline pays."""
    zk = zorder_key([quantize(c, lo, hi, bits) for c, lo, hi in specs], bits)
    (
        df.withColumn("__zkey", zk)
        .repartitionByRange(files, "__zkey")
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
        .write.mode("overwrite")
        .parquet(path)
    )


def zorder_pruned_scan(
    spark: SparkSession,
    path: str,
    preds: dict[str, tuple],
) -> tuple[DataFrame, dict]:
    """Scan ``path`` keeping only files whose footer [min, max] range
    intersects EVERY ``col: (lo, hi)`` predicate. Returns (df, stats)
    with ``files_total`` / ``files_scanned`` skipping evidence; the
    residual filter is applied (and parquet-pushed) inside surviving
    files, so pruning is never a correctness input."""
    files = sorted(
        os.path.join(r, f)
        for r, _d, fl in os.walk(path)
        for f in fl
        if f.endswith(".parquet")
    )
    keep = []
    for f in files:
        ok = True
        for col, (lo, hi) in preds.items():
            rng = _file_key_range(f, col)
            if rng is not None and (rng[0] > hi or rng[1] < lo):
                ok = False
                break
        if ok:
            keep.append(f)
    stats = {"files_total": len(files), "files_scanned": len(keep)}
    if not keep:
        empty = spark.read.parquet(path).filter(F.lit(False))
        return empty, stats
    df = spark.read.parquet(*keep)
    for col, (lo, hi) in preds.items():
        df = df.filter(F.col(col).between(lo, hi))
    return df, stats
