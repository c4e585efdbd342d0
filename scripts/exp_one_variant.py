"""Time ONE ivf-build variant in a FRESH JVM (session-state-clean):
    python scripts/exp_one_variant.py {bin|jvm|i8} [N]
Prints a single JSON line. Used for the r14 build-path decision —
within-session comparisons are contaminated by cumulative JVM
degradation (same variant measured 55 s in position 2 and 150 s in
position 5 of one session)."""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VARIANT = sys.argv[1]
N = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
DIM = 768
CENT = f"/tmp/laion_bench_8000000x{DIM}_ivf256rg8_centroids.json"


def main() -> None:
    from pyspark.sql import functions as F

    from laion_spark.operators.similarity import IVFIndex
    from laion_spark.session import get_session
    from laion_spark.sources.halfvec import _flba_sink, write_int8_index

    from bench import synth_df
    from scripts.exp_binary_pipeline import assign_bin, synth_bin

    spark = get_session(f"exp_one_{VARIANT}")
    spark.sparkContext.setLogLevel("ERROR")
    idx = IVFIndex(dim=DIM, n_clusters=256, n_iters=4, nprobe=2)
    idx.centroids = json.load(open(CENT))
    p = f"/tmp/exp_one_{VARIANT}_{N}.parquet"

    # small warm-up so JVM/worker startup is not in the measurement
    synth_df(spark, 50_000, DIM, clustered=True).selectExpr("count(*)").collect()

    def run():
        shutil.rmtree(p, ignore_errors=True)
        if VARIANT == "jvm":
            idx.write_index(synth_df(spark, N, DIM, clustered=True), p,
                            "embedding", row_group_bytes=8 * 1024 * 1024)
        elif VARIANT == "bin":
            sink = _flba_sink(p, 4 * DIM, "ivf_cluster", "embedding",
                              8 * 1024 * 1024, "snappy", "")
            (assign_bin(synth_bin(spark, N, DIM), idx.centroids, DIM)
             .repartition(spark.sparkContext.defaultParallelism, F.col("ivf_cluster"))
             .mapInArrow(sink, "path string, rows long")
             .collect())
        elif VARIANT == "i8":
            write_int8_index(
                idx.build(synth_df(spark, N, DIM, clustered=True), "embedding"),
                p, dim=DIM, mode="overwrite")
        else:
            raise SystemExit(f"unknown variant {VARIANT}")

    ts = []
    for _ in range(2):
        s = time.perf_counter()
        run()
        ts.append(round(time.perf_counter() - s, 1))
    shutil.rmtree(p, ignore_errors=True)
    print(json.dumps({"variant": VARIANT, "n": N, "runs": ts, "best": min(ts)}))


if __name__ == "__main__":
    main()
