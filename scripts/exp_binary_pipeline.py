"""Decisive A/B for the ivf f32 build (r14): does keeping the vector
column as PACKED BINARY through every JVM crossing (gen -> assign ->
shuffle -> sink) beat the list<float> paths?

Variants at N x 768 (warm, one session):
  1. gen_list_count    — synth_df(list) -> count        [list ingestion tax]
  2. gen_bin_count     — synth emitting binary -> count [binary ingestion]
  3. i8_onepass        — write_int8_index(idx.build(gen_list))  [known-good]
  4. f32_bin_pipeline  — gen_bin -> assign_bin -> shuffle -> FLBA sink
  5. jvm_list_write    — idx.write_index(gen_list)      [status quo]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 1_000_000
DIM = 768
CENT = f"/tmp/laion_bench_8000000x{DIM}_ivf256rg8_centroids.json"


def synth_bin(spark, n, dim, start=0):
    """synth_df's generator, but the embedding column is emitted as
    packed little-endian float32 BINARY — the JVM side sees an opaque
    byte blob instead of a 768-element list."""
    import numpy as np
    import pyarrow as pa

    def gen(batches):
        GOLD = np.uint64(0x9E3779B97F4A7C15)
        M1 = np.uint64(0xBF58476D1CE4E5B9)
        M2 = np.uint64(0x94D049BB133111EB)

        def u01(ctr):
            z = ctr * GOLD
            z = (z ^ (z >> np.uint64(30))) * M1
            z = (z ^ (z >> np.uint64(27))) * M2
            z = z ^ (z >> np.uint64(31))
            return (z >> np.uint64(11)).astype(np.float64) * (2.0 ** -53)

        centers = np.random.default_rng(123).random((256, dim), dtype=np.float32) * 2 - 1
        half = dim // 2
        for rb in batches:
            ids = rb.column(0)
            m = len(ids)
            idv = ids.to_numpy().astype(np.uint64)
            ctr = idv[:, None] * np.uint64(dim) + np.arange(dim, dtype=np.uint64)
            u = u01(ctr)
            idx = np.asarray(ids.to_numpy()) % 256
            r = np.sqrt(-2.0 * np.log(np.maximum(u[:, :half], 2.0 ** -53)))
            th = (2.0 * np.pi) * u[:, half:]
            noise = np.empty((m, dim), dtype=np.float32)
            noise[:, 0::2] = (r * np.cos(th)).astype(np.float32)
            noise[:, 1::2] = (r * np.sin(th)).astype(np.float32)
            flat = np.ascontiguousarray(centers[idx] + 0.3 * noise, dtype=np.float32)
            offs = np.arange(0, (m + 1) * 4 * dim, 4 * dim, dtype=np.int32)
            emb = pa.Array.from_buffers(
                pa.binary(), m,
                [None, pa.py_buffer(offs.tobytes()), pa.py_buffer(flat.tobytes())],
            )
            yield pa.RecordBatch.from_arrays([ids, emb], ["id", "embedding"])

    return spark.range(start, n, 1, 64).mapInArrow(gen, "id long, embedding binary")


def assign_bin(df, cents, dim):
    """Cluster-assign a packed-binary vector column (frombuffer GEMM),
    appending ivf_cluster — binary in, binary out."""
    import numpy as np
    import pyarrow as pa

    def assign(batches):
        C = np.asarray(cents, dtype=np.float64)
        cc = np.einsum("ij,ij->i", C, C)
        for rb in batches:
            vi = rb.schema.get_field_index("embedding")
            col = rb.column(vi)
            n = len(col)
            if n == 0:
                continue
            arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
            off = np.frombuffer(arr.buffers()[1], np.int32, count=n + 1,
                                offset=arr.offset * 4)
            start = int(off[0])
            mat = np.frombuffer(
                memoryview(arr.buffers()[2])[start:start + n * 4 * dim], np.float32
            ).reshape(n, dim).astype(np.float64)
            cid = np.argmin(cc[None, :] - 2.0 * (mat @ C.T), axis=1).astype(np.int32)
            arrays = [rb.column(i) for i in range(rb.num_columns)]
            arrays.append(pa.array(cid, type=pa.int32()))
            yield pa.RecordBatch.from_arrays(
                arrays, [f.name for f in rb.schema] + ["ivf_cluster"])

    return df.mapInArrow(assign, "id long, embedding binary, ivf_cluster int")


def main() -> None:
    from pyspark.sql import functions as F

    from laion_spark.operators.similarity import IVFIndex
    from laion_spark.session import get_session
    from laion_spark.sources.halfvec import _flba_sink, write_int8_index

    from bench import synth_df

    spark = get_session("exp_binary_pipeline")
    spark.sparkContext.setLogLevel("ERROR")
    idx = IVFIndex(dim=DIM, n_clusters=256, n_iters=4, nprobe=2)
    idx.centroids = json.load(open(CENT))
    out = {}

    def t(label, fn, reps=2):
        fn()
        ts = []
        for _ in range(reps):
            s = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - s)
        out[label] = round(min(ts), 1)
        print("profile:", label, out[label], file=sys.stderr)

    t("gen_list_count", lambda: synth_df(spark, N, DIM, clustered=True)
      .selectExpr("count(*)").collect())
    t("gen_bin_count", lambda: synth_bin(spark, N, DIM)
      .selectExpr("count(*)").collect())

    p = f"/tmp/exp_bp_{N}.parquet"

    def i8_onepass():
        shutil.rmtree(p, ignore_errors=True)
        write_int8_index(idx.build(synth_df(spark, N, DIM, clustered=True), "embedding"),
                         p, dim=DIM, mode="overwrite")

    s = time.perf_counter(); i8_onepass(); out["i8_onepass"] = round(time.perf_counter() - s, 1)
    print("profile: i8_onepass", out["i8_onepass"], file=sys.stderr)

    def f32_bin_pipeline():
        shutil.rmtree(p, ignore_errors=True)
        sink = _flba_sink(p, 4 * DIM, "ivf_cluster", "embedding",
                          8 * 1024 * 1024, "snappy", "")
        (assign_bin(synth_bin(spark, N, DIM), idx.centroids, DIM)
         .repartition(spark.sparkContext.defaultParallelism, F.col("ivf_cluster"))
         .mapInArrow(sink, "path string, rows long")
         .collect())

    s = time.perf_counter(); f32_bin_pipeline(); out["f32_bin_pipeline"] = round(time.perf_counter() - s, 1)
    print("profile: f32_bin_pipeline", out["f32_bin_pipeline"], file=sys.stderr)

    # sanity: the binary pipeline's table serves identical top-k to a
    # list-layout build of the same data
    from laion_spark.operators.knn import knn_search_parquet

    q = [0.01 * (i % 7 - 3) for i in range(DIM)]
    ids_bin = [r.id for r in knn_search_parquet(
        spark, p, q, k=10, vector_col="embedding", select=["id"]).collect()]

    p2 = f"/tmp/exp_bp_list_{N}.parquet"

    def jvm_list_write():
        shutil.rmtree(p2, ignore_errors=True)
        idx.write_index(synth_df(spark, N, DIM, clustered=True), p2,
                        "embedding", row_group_bytes=8 * 1024 * 1024)

    s = time.perf_counter(); jvm_list_write(); out["jvm_list_write"] = round(time.perf_counter() - s, 1)
    print("profile: jvm_list_write", out["jvm_list_write"], file=sys.stderr)
    ids_list = [r.id for r in knn_search_parquet(
        spark, p2, q, k=10, vector_col="embedding", select=["id"]).collect()]
    out["ids_equal"] = ids_bin == ids_list
    shutil.rmtree(p, ignore_errors=True)
    shutil.rmtree(p2, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
