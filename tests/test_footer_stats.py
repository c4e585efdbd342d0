"""G63: distributed parts-stats footer pass (sources/minmax.py
collect_file_stats) — the system.parts metadata read (reference analog:
ClickHouse primary.idx / parts metadata, BASELINE.md MergeTree layout)
fanned out as a mapInArrow over the file list above a threshold, with
the driver loop kept as the small-table fast path. The two paths must
be result-identical."""

import os

from pyspark.sql import functions as F


def _write_partitioned(spark, sf_dir, base):
    o = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .withColumn("bucket", F.pmod("o_orderkey", F.lit(4)))
    )
    o.write.partitionBy("bucket").mode("overwrite").parquet(base)
    tasks = []
    for bdir in sorted(os.listdir(base)):
        if not bdir.startswith("bucket="):
            continue
        for fn in sorted(os.listdir(os.path.join(base, bdir))):
            if fn.endswith(".parquet"):
                tasks.append((bdir, os.path.join(base, bdir, fn)))
    return tasks


def test_distributed_path_matches_driver_path(spark, sf_dir, tmp_path):
    from laion_spark.sources.minmax import collect_file_stats

    base = str(tmp_path / "parts")
    tasks = _write_partitioned(spark, sf_dir, base)
    assert tasks
    driver = collect_file_stats(spark, tasks, "o_orderkey", distributed_threshold=10**9)
    dist = collect_file_stats(spark, tasks, "o_orderkey", distributed_threshold=0)
    assert sorted(driver) == sorted(dist)
    # stats rows are real: totals equal the table's row count and the
    # min/max span the key
    n = spark.read.parquet(base).count()
    assert sum(r[1] for r in driver) == n
    assert all(r[4] for r in driver)  # pyarrow writes stats by default
    lo = min(r[2] for r in driver)
    hi = max(r[3] for r in driver)
    row = spark.read.parquet(base).agg(F.min("o_orderkey"), F.max("o_orderkey")).collect()[0]
    assert (lo, hi) == (row[0], row[1])


def test_stats_less_file_reported_not_guessed(spark, tmp_path):
    """A file written without statistics must come back has_stats=False
    (callers scan it), never a fabricated range — on BOTH paths."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from laion_spark.sources.minmax import collect_file_stats

    p = str(tmp_path / "nostats.parquet")
    pq.write_table(
        pa.table({"o_orderkey": [5, 1, 9]}), p, write_statistics=False
    )
    for thr in (10**9, 0):
        rows = collect_file_stats(spark, [("part=0", p)], "o_orderkey", distributed_threshold=thr)
        assert rows == [("part=0", 3, None, None, False)], (thr, rows)


def test_empty_part_file_reported_statsless(spark, tmp_path):
    """ADVICE r10: a zero-row-group part file has no key range; it must
    come back has_stats=False on both paths (a (n=0, None, None, True)
    row makes a mixed-bucket rollup evaluate min(int, None) and raise),
    and the pruned-scan path must KEEP such a file, not crash on it."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from laion_spark.sources.minmax import (
        _file_key_range,
        collect_file_stats,
        minmax_pruned_scan,
    )

    base = tmp_path / "mixed"
    base.mkdir()
    full = str(base / "a.parquet")
    empty = str(base / "b.parquet")
    pq.write_table(pa.table({"o_orderkey": [5, 1, 9]}), full)
    # write_table of a 0-row table still emits one row group; a truly
    # row-group-less footer needs a writer closed without any write
    pq.ParquetWriter(empty, pa.schema([("o_orderkey", pa.int64())])).close()
    assert pq.ParquetFile(empty).metadata.num_row_groups == 0  # fixture premise

    tasks = [("part=0", full), ("part=0", empty)]
    for thr in (10**9, 0):
        rows = collect_file_stats(spark, tasks, "o_orderkey", distributed_threshold=thr)
        assert rows[1] == ("part=0", 0, None, None, False), (thr, rows)
        # the rollup a caller would write must not raise on the bucket
        stat = [r for r in rows if r[4]]
        assert min(r[2] for r in stat) == 1 and max(r[3] for r in stat) == 9

    assert _file_key_range(empty, "o_orderkey") is None
    df, st = minmax_pruned_scan(spark, str(base), "o_orderkey", 4, 6)
    assert st == {"files_total": 2, "files_scanned": 2}  # empty file kept
    assert [r[0] for r in df.collect()] == [5]


def test_missing_key_column_reported(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from laion_spark.sources.minmax import collect_file_stats

    p = str(tmp_path / "nocol.parquet")
    pq.write_table(pa.table({"other": [1, 2]}), p)
    for thr in (10**9, 0):
        rows = collect_file_stats(spark, [("part=0", p)], "o_orderkey", distributed_threshold=thr)
        assert rows == [("part=0", 2, None, None, False)], (thr, rows)
