"""Stage-by-stage profile of the ivf build pipeline at 1M x 768 (r14):
synth -> assign -> shuffle -> write, timed cumulatively and warm.
Identifies which stage owns the ~55 s/1M-row pipeline floor."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
DIM = 768
CENT = f"/tmp/laion_bench_8000000x{DIM}_ivf256rg8_centroids.json"


def main() -> None:
    from pyspark.sql import functions as F

    from laion_spark.operators.similarity import IVFIndex
    from laion_spark.session import get_session

    from bench import synth_df

    spark = get_session("exp_build_profile")
    spark.sparkContext.setLogLevel("ERROR")
    idx = IVFIndex(dim=DIM, n_clusters=256, n_iters=4, nprobe=2)
    idx.centroids = json.load(open(CENT))

    out = {}

    def t(label, fn, reps=2):
        fn()  # warm
        ts = []
        for _ in range(reps):
            s = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - s)
        out[label] = round(min(ts), 1)
        print("profile:", label, out[label], file=sys.stderr)

    # 1. generation only (count forces full evaluation, no exchange)
    t("synth", lambda: synth_df(spark, N, DIM, clustered=True)
      .selectExpr("count(*)").collect())

    # 2. + assign (mapInArrow GEMM)
    t("synth_assign", lambda: idx.build(synth_df(spark, N, DIM, clustered=True), "embedding")
      .selectExpr("count(*)").collect())

    # 3. + cluster exchange (count on the shuffled side)
    t("synth_assign_shuffle", lambda: idx.build(synth_df(spark, N, DIM, clustered=True), "embedding")
      .repartition(256, F.col("ivf_cluster")).selectExpr("count(*)").collect())

    # 4. full JVM write (one rep; rm between)
    import shutil

    p = f"/tmp/exp_prof_{N}.parquet"

    def jvm_write():
        shutil.rmtree(p, ignore_errors=True)
        idx.write_index(synth_df(spark, N, DIM, clustered=True), p,
                        "embedding", row_group_bytes=8 * 1024 * 1024)

    s = time.perf_counter(); jvm_write(); out["jvm_write_total"] = round(time.perf_counter() - s, 1)
    print("profile: jvm_write_total", out["jvm_write_total"], file=sys.stderr)

    # 5. write WITHOUT the exchange: partitionBy from the 64 gen tasks
    # (files = tasks x clusters, but zero shuffle)
    def jvm_write_noshuffle():
        shutil.rmtree(p, ignore_errors=True)
        (idx.build(synth_df(spark, N, DIM, clustered=True), "embedding")
         .write.mode("overwrite")
         .option("parquet.block.size", 8 * 1024 * 1024)
         .partitionBy("ivf_cluster").parquet(p))

    s = time.perf_counter(); jvm_write_noshuffle(); out["jvm_write_noshuffle"] = round(time.perf_counter() - s, 1)
    print("profile: jvm_write_noshuffle", out["jvm_write_noshuffle"], file=sys.stderr)
    shutil.rmtree(p, ignore_errors=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
