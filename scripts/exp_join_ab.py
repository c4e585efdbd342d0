"""Adjacent A/B for the knn_join_parquet scorer rewrite (r14).

Builds (once, cached in /tmp) a 2M x 768 clustered packed-f32 ivf table
with C=64 clusters, then times a 512-query nprobe-2 batched ANN join —
the ann768_cjoin2k shape at 1/4 corpus scale. Run it twice, once with
the pre-r14 scorer (git stash) and once with the vectorized one, in
adjacent fresh sessions so the IO/CPU weather matches:

    python scripts/exp_join_ab.py <label>

Prints one line: label, median/best of 3, rows, queries.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N, DIM, C, NQ, NPROBE = 2_000_000, 768, 64, 512, 2
PATH = f"/tmp/laion_exp_joinab_{N}x{DIM}_ivf{C}.parquet"
CENT = f"/tmp/laion_exp_joinab_{N}x{DIM}_ivf{C}_centroids.json"


def main() -> None:
    import json

    label = sys.argv[1] if len(sys.argv) > 1 else "run"
    import bench
    from laion_spark.operators.similarity import IVFIndex
    from laion_spark.session import get_session
    from laion_spark.sources.halfvec import write_packed_index

    spark = get_session("exp_join_ab")
    idx = IVFIndex(dim=DIM, n_clusters=C, n_iters=2, nprobe=NPROBE)
    if os.path.exists(CENT) and os.path.exists(f"{PATH}/_DONE"):
        idx.centroids = json.load(open(CENT))
    else:
        gen = bench.synth_df(spark, N, DIM, clustered=True)
        t0 = time.perf_counter()
        idx.fit(gen, id_col="id", vector_col="embedding", fit_rows=100_000)
        write_packed_index(
            idx.build(bench.synth_df(spark, N, DIM, clustered=True, packed=True), "embedding"),
            PATH, dim=DIM, vector_col="embedding",
            row_group_bytes=8 * 1024 * 1024, mode="overwrite",
        )
        json.dump(idx.centroids, open(CENT, "w"))
        open(f"{PATH}/_DONE", "w").close()
        print(f"  build: {time.perf_counter()-t0:.1f}s", file=sys.stderr)

    vecs = spark.read.parquet(PATH)
    from pyspark.sql import functions as F

    step = N // NQ
    rows = (
        vecs.filter((F.col("id") % step == 7) & (F.col("id") < step * NQ))
        .select("id", "embedding")
        .collect()
    )
    qdf = spark.createDataFrame(
        [(r.id, bench.vec_f32(r.embedding)) for r in rows],
        "id long, embedding array<float>",
    )

    def run():
        return idx.knn_join_parquet(
            spark, PATH, qdf, k=10, query_id="id", query_vec="embedding",
            corpus_id="id", vector_col="embedding", nprobe=NPROBE,
            max_queries=NQ,
        ).collect()

    got = run()  # warm
    ts = sorted(bench.timed(run) for _ in range(3))
    print(
        f"JOINAB {label}: med={ts[1]} best={ts[0]} all={ts} "
        f"rows={N} queries={len(rows)} out={len(got)}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
