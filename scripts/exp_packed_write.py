"""A/B the IVF f32 table write path at 2M rows (r14 investigation):

  A. status quo: IVFIndex.write_index — assign (mapInArrow) →
     repartition(256, cluster) → JVM list<float> parquet write
  B. packed f32: assign → pack map-side into binary(4*dim) →
     repartition → python pyarrow FLBA sink (write_int8_index's shape
     without quantization)

Also times the read side: one exact knn scan over each layout.
Run AFTER any bench finishes (dedicated machine time).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
DIM = 768
CENT = f"/tmp/laion_bench_8000000x{DIM}_ivf256rg8_centroids.json"


def main() -> None:
    from laion_spark.operators.knn import knn_search_parquet
    from laion_spark.operators.similarity import IVFIndex
    from laion_spark.session import get_session

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import synth_df

    spark = get_session("exp_packed_write")
    spark.sparkContext.setLogLevel("ERROR")

    idx = IVFIndex(dim=DIM, n_clusters=256, n_iters=4, nprobe=2)
    if os.path.exists(CENT):
        idx.centroids = json.load(open(CENT))
    else:
        idx.fit(synth_df(spark, N, DIM, clustered=True), id_col="id",
                vector_col="embedding", fit_rows=200_000)

    out = {}

    # warm the synth path once so generation cost is comparable
    t0 = time.perf_counter()
    synth_df(spark, N, DIM, clustered=True).selectExpr("count(*)").collect()
    out["synth_only"] = round(time.perf_counter() - t0, 1)

    # A: JVM list<float> write
    pa_path = f"/tmp/exp_ivf_list_{N}.parquet"
    t0 = time.perf_counter()
    idx.write_index(
        synth_df(spark, N, DIM, clustered=True), pa_path,
        vector_col="embedding", row_group_bytes=8 * 1024 * 1024,
    )
    out["jvm_list_write"] = round(time.perf_counter() - t0, 1)
    print("progress:", json.dumps(out), file=sys.stderr)

    # B: packed f32 python sink
    from laion_spark.sources.halfvec import write_packed_index

    pb_path = f"/tmp/exp_ivf_packed_{N}.parquet"
    t0 = time.perf_counter()
    write_packed_index(
        idx.build(synth_df(spark, N, DIM, clustered=True), "embedding"),
        pb_path, dim=DIM, vector_col="embedding",
        row_group_bytes=8 * 1024 * 1024, mode="overwrite",
    )
    out["py_packed_write"] = round(time.perf_counter() - t0, 1)
    print("progress:", json.dumps(out), file=sys.stderr)

    import subprocess

    for k, p in (("list", pa_path), ("packed", pb_path)):
        out[f"du_{k}_gb"] = round(
            int(subprocess.check_output(["du", "-sb", p]).split()[0]) / 1024**3, 2
        )

    # read side: exact scan over each layout (same query)
    q = [0.01 * (i % 7 - 3) for i in range(DIM)]
    for k, p in (("list", pa_path), ("packed", pb_path)):
        ids = [r.id for r in knn_search_parquet(
            spark, p, q, k=10, vector_col="embedding", select=["id"]).collect()]
        t0 = time.perf_counter()
        knn_search_parquet(spark, p, q, k=10, vector_col="embedding",
                           select=["id"]).collect()
        out[f"scan_{k}"] = round(time.perf_counter() - t0, 2)
        out[f"top10_{k}"] = ids
        print("progress:", json.dumps({x: y for x, y in out.items() if "top10" not in x}),
              file=sys.stderr)

    out["ids_equal"] = out.pop("top10_list") == out.pop("top10_packed")
    print(json.dumps(out))
    import shutil

    shutil.rmtree(pa_path, ignore_errors=True)
    shutil.rmtree(pb_path, ignore_errors=True)


if __name__ == "__main__":
    main()
