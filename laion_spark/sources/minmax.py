"""File-level min/max data skipping over a sort-keyed parquet layout —
the ClickHouse MergeTree ORDER BY / primary-index analog (SURVEY.md
§2.16; reference north star: ClickHouse reads primary.idx and skips
whole granules whose key range misses the predicate).

Spark's built-in parquet reader already skips ROW GROUPS whose
footer statistics miss a pushed filter, but it still opens every
file's footer at runtime. When the layout is key-sorted across files
(``repartitionByRange(key).sortWithinPartitions(key)`` — the
MergeTree ``ORDER BY`` write discipline), each file covers a narrow,
nearly disjoint key range, so file-level pruning from footer stats
alone eliminates most of the scan BEFORE Spark plans a single task:

    planning:  read N footers (metadata-only, ~KB each)      driver
    execution: scan only the files whose [min,max] intersects  tasks

At 100 TB / object storage the footer pass is exactly ClickHouse's
primary-index read (one small metadata object per part), and the
residual in-file filter still row-group-prunes via the same stats.
The pruning decision is conservative: files without stats for the
key column are KEPT, so the result is always correct, just less
pruned.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F


def _file_key_range(path: str, column: str):
    """(min, max) of ``column`` across a parquet file's row groups from
    footer statistics only, or None when any row group lacks stats."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(path).metadata
    idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
    if column not in idx:
        return None
    lo = hi = None
    for rg in range(md.num_row_groups):
        st = md.row_group(rg).column(idx[column]).statistics
        if st is None or not st.has_min_max:
            return None
        lo = st.min if lo is None else min(lo, st.min)
        hi = st.max if hi is None else max(hi, st.max)
    return (lo, hi)


def minmax_pruned_scan(
    spark: SparkSession,
    path: str,
    column: str,
    lo,
    hi,
) -> tuple[DataFrame, dict]:
    """Scan ``path`` for rows with ``lo <= column <= hi``, reading ONLY
    the files whose footer [min,max] range intersects [lo, hi].

    Returns (df, stats) where stats records ``files_total`` /
    ``files_scanned`` — the skipping evidence a test can pin. The
    residual predicate is still applied (and pushed down) inside the
    surviving files, so correctness never depends on the stats.
    """
    files = sorted(
        os.path.join(r, f)
        for r, _d, fl in os.walk(path)
        for f in fl
        if f.endswith(".parquet")
    )
    keep = []
    for f in files:
        rng = _file_key_range(f, column)
        if rng is None or (rng[0] <= hi and rng[1] >= lo):
            keep.append(f)
    stats = {"files_total": len(files), "files_scanned": len(keep)}
    if not keep:
        df = spark.read.parquet(path).filter(F.lit(False))
        return df, stats
    df = spark.read.parquet(*keep).filter(F.col(column).between(lo, hi))
    return df, stats
