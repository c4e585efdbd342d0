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
    # zero row groups (empty part file): no range exists — report "no
    # stats" so callers keep the file rather than compare against None
    # (ADVICE r10)
    return None if lo is None else (lo, hi)


def collect_file_stats(
    spark: SparkSession,
    tasks: list,
    column: str,
    distributed_threshold: int = 64,
) -> list:
    """Per-FILE footer statistics for a list of ``(part_label,
    file_path)`` tasks — the system.parts metadata read (reference
    analog: ClickHouse reads one small primary.idx/count per part
    instead of scanning it). Returns one tuple per file:
    ``(part_label, n_rows, key_min, key_max, has_stats)``.

    Up to ``distributed_threshold`` files the driver reads the footers
    itself (a handful of ~KB metadata reads — the fast path every
    interactive parts query wants). Above it the reads fan out as a
    ``mapInArrow`` over the file list — one footer open per task, only
    the tiny stats rows return — so a 10^5-10^6-part listing never
    serializes on the driver (VERDICT r9 #6). Both paths are
    result-identical (unit-pinned in tests/test_footer_stats.py).

    ``has_stats=False`` (missing column, or any row group without
    min/max) means the caller must scan that part — the range is never
    guessed. Integer key columns only: the distributed schema declares
    long min/max (the MergeTree ORDER BY key analog)."""

    def file_stats(path: str):
        import pyarrow.parquet as pq

        md = pq.ParquetFile(path).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        n = md.num_rows
        lo = hi = None
        # an empty part file (zero row groups) has no key range: it must
        # come back has_stats=False, or a rollup folding min(int, None)
        # over a mixed bucket raises (ADVICE r10)
        ok = column in idx and md.num_row_groups > 0
        if ok:
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx[column]).statistics
                if st is None or not st.has_min_max:
                    ok = False
                    break
                lo = st.min if lo is None else min(lo, st.min)
                hi = st.max if hi is None else max(hi, st.max)
        return (n, lo if ok else None, hi if ok else None, ok)

    if len(tasks) <= distributed_threshold:
        return [(p, *file_stats(f)) for p, f in tasks]

    def read_footers(batches):
        import pyarrow as pa

        for rb in batches:
            parts, ns, los, his, oks = [], [], [], [], []
            for p, f in zip(rb.column(0).to_pylist(), rb.column(1).to_pylist()):
                n, lo, hi, ok = file_stats(f)
                parts.append(p)
                ns.append(n)
                los.append(lo)
                his.append(hi)
                oks.append(ok)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(parts),
                    pa.array(ns, type=pa.int64()),
                    pa.array(los, type=pa.int64()),
                    pa.array(his, type=pa.int64()),
                    pa.array(oks),
                ],
                ["part", "n_rows", "key_min", "key_max", "has_stats"],
            )

    from laion_spark.session import _ship_package

    _ship_package(spark)
    jobs = spark.createDataFrame(list(tasks), "part string, path string")
    n_parts = max(1, min(len(tasks), spark.sparkContext.defaultParallelism))
    if n_parts > 1:
        jobs = jobs.repartition(n_parts)
    rows = jobs.mapInArrow(
        read_footers,
        "part string, n_rows long, key_min long, key_max long, has_stats boolean",
    ).collect()
    return [(r.part, r.n_rows, r.key_min, r.key_max, r.has_stats) for r in rows]


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
