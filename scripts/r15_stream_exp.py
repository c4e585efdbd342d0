"""r15 ask #4 (VERDICT r14): streaming per-batch fixed cost.

Measures stream10m (single availableNow batch) and stream10m_wm
(16-files-per-trigger multi-batch replay) under variants:
  - state/shuffle partitions: session default (=cores) vs 8 vs 4
  - state store provider: HDFS-backed (default) vs RocksDB
capturing the per-batch durationMs breakdown AND the stateOperators
commit/update times — the evidence the VERDICT asks for ("a per-batch
ms breakdown proving the floor is commit-bound"), plus whether fewer
state partitions actually move the wall clock.

Usage: python scripts/r15_stream_exp.py
"""
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from laion_spark.session import get_session

import bench  # noqa: E402

spark = get_session("r15_stream_exp")
epath = bench.ensure_events10m(spark)

# time-ordered copy for the wm variant
spath = "/tmp/laion_events_10000000_tsorted.parquet"
if not os.path.exists(f"{spath}/_SUCCESS"):
    ev10 = spark.read.parquet(epath)
    t0 = time.perf_counter()
    ev10.repartitionByRange(64, "ts_us").sortWithinPartitions("ts_us").write.mode(
        "overwrite"
    ).parquet(spath)
    print(f"tsorted build: {time.perf_counter()-t0:.1f}s", flush=True)

schema = spark.read.parquet(epath).schema


def run_stream(src_path, files_per_trigger=None, shuffle_parts=None, rocksdb=False):
    from laion_spark.streaming.windows import tumbling_counts

    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    if shuffle_parts:
        spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_parts))
    if rocksdb:
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
        )
    ck = tempfile.mkdtemp(prefix="laion_r15_ck_")
    try:
        rd = spark.readStream.schema(schema)
        if files_per_trigger:
            rd = rd.option("maxFilesPerTrigger", str(files_per_trigger))
        src = rd.parquet(src_path).withColumn("ts_t", F.timestamp_micros("ts_us"))
        q = (
            tumbling_counts(src, window="1 hour", watermark="30 minutes")
            .writeStream.format("noop")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        t0 = time.perf_counter()
        q.awaitTermination()
        wall = time.perf_counter() - t0
        prog = []
        for p in q.recentProgress:
            prog.append(p if isinstance(p, dict) else json.loads(p.json))
        return wall, prog
    finally:
        shutil.rmtree(ck, ignore_errors=True)
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)
        if rocksdb:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


def summarize(tag, wall, prog):
    dm: dict[str, int] = {}
    st: dict[str, int] = {}
    for p in prog:
        for k, v in (p.get("durationMs") or {}).items():
            dm[k] = dm.get(k, 0) + int(v)
        for so in p.get("stateOperators") or []:
            for k in ("allUpdatesTimeMs", "commitTimeMs", "allRemovalsTimeMs",
                      "timeTakenToEvictMs" if "timeTakenToEvictMs" in so else "numRowsTotal"):
                if k in so and isinstance(so[k], (int, float)):
                    st[k] = st.get(k, 0) + int(so[k])
    print(f"{tag}: wall={wall:.2f}s batches={len(prog)} durationMs={dm} state={st}", flush=True)


for tag, kw in [
    ("stream10m base (parts=32)", dict()),
    ("stream10m parts=8", dict(shuffle_parts=8)),
    ("stream10m rocksdb", dict(rocksdb=True)),
]:
    # warm once, then 2 timed
    run_stream(epath, **kw)
    for i in range(2):
        wall, prog = run_stream(epath, **kw)
        summarize(f"{tag} rep{i}", wall, prog)

for tag, kw in [
    ("wm16 base (parts=32)", dict(files_per_trigger=16)),
    ("wm16 parts=8", dict(files_per_trigger=16, shuffle_parts=8)),
    ("wm16 parts=4", dict(files_per_trigger=16, shuffle_parts=4)),
    ("wm16 rocksdb", dict(files_per_trigger=16, rocksdb=True)),
    ("wm32", dict(files_per_trigger=32)),
]:
    run_stream(spath, **kw)
    for i in range(2):
        wall, prog = run_stream(spath, **kw)
        summarize(f"{tag} rep{i}", wall, prog)

spark.stop()
