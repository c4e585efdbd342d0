#!/usr/bin/env python
"""BENCH harness — headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS], printing ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Two classes of measurement:
  - catalog headliners: representative oracle-checked queries from
    laion_spark.catalog at the bench scale factor;
  - ``knn768``: the BASELINE-comparable number — brute-force L2
    top-10 over a deterministic synthetic 1M x 768-d table
    (FIXTURES.md §6 ``laion_bench`` shape), scored by the scan-side
    Arrow+BLAS path (knn_search_parquet — exact, parity-tested
    against the codegen path). BASELINE.md's slowest brute-force row
    is 10.272 s for 10M rows x 768-d; scaled linearly to 1M rows the
    reference-equivalent is ~1.03 s, so the 2x contract target is
    <= ~2.05 s (>= ~487k rows/s).

Every timing is wall-clock of a full action (collect) after a warm-up
run of the session (JVM/codegen warm, data in OS page cache — matching
the reference's warm-server numbers). knn768 reports the MEDIAN of 5
runs in ``queries`` plus the BEST run and best-run rows/s as separate
fields: this host shows 5-30x wall-clock swings under neighbor CPU
contention, and a median alone can neither prove nor disprove the 2x
contract — the best-of-N is the contention-resistant throughput bound.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from laion_spark.operators.knn import knn_search, knn_search_parquet
from laion_spark.session import get_session

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_VEC = int(os.environ.get("SPARK_GRAFT_BENCH_ROWS", "1000000"))
DIM = 768

#: catalog queries worth timing (one per operator family)
HEADLINERS = [
    "v01_knn_l2_topk",
    "v03_knn_cosine_topk",
    "v08_knn_join",
    "v09_label_centroids",
    "q01_pricing_summary",
    "q02_join_revenue_by_segment",
    "q10_window_rank",
    "q30_shipping_priority",
    "e02_sessionization",
    "t02_top_tokens",
    "d03_jaccard_similar_pairs",
]


def timed(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return round(time.perf_counter() - t0, 4)


def synth_vectors(spark, n: int, dim: int):
    """Deterministic n x dim float32 vectors (FIXTURES.md §6
    ``laion_bench`` shape), generated distributed via numpy-backed
    mapInPandas (a per-column ``rand()`` expression tree would blow the
    64KB codegen limit at dim=768) and materialized once as parquet —
    the timed query then measures the honest path: columnar scan +
    JVM-side scoring, like the reference's warm server."""
    path = f"/tmp/laion_bench_{n}x{dim}.parquet"
    if not os.path.exists(f"{path}/_SUCCESS"):  # absent or partial write

        def gen(batches):
            # mapInArrow + flat ListArray build: near-memcpy, unlike the
            # pandas object-column path (~5k rows/s at dim=768)
            import numpy as np
            import pyarrow as pa

            for rb in batches:
                ids = rb.column(0)
                m = len(ids)
                rng = np.random.default_rng(42 + int(ids[0].as_py()))
                flat = (rng.random((m, dim), dtype=np.float32) * 2 - 1).ravel()
                offsets = pa.array(np.arange(0, (m + 1) * dim, dim, dtype=np.int32))
                emb = pa.ListArray.from_arrays(offsets, pa.array(flat, type=pa.float32()))
                yield pa.RecordBatch.from_arrays([ids, emb], ["id", "embedding"])

        (
            spark.range(n)
            .repartition(64)
            .mapInArrow(gen, "id long, embedding array<float>")
            .write.mode("overwrite")
            .parquet(path)
        )
    return spark.read.parquet(path)


def main() -> None:
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_session("laion_spark_bench")
    # local-bench parallelism: testdata tables are single small files;
    # 128MB splits would give 1-3 tasks for a 25MB table. On a real
    # cluster the default (128MB ~ one row group) is correct.
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(4 * 1024 * 1024))
    queries: dict[str, float] = {}

    from laion_spark.catalog import REGISTRY

    # warm-up: JVM + parquet footers
    spark.read.parquet(f"{SF_DIR}/lineitem.parquet").count()

    for name in HEADLINERS:
        spec = REGISTRY[name]
        spec.fn(spark, SF_DIR).collect()  # warm (codegen + cache)
        queries[name] = timed(lambda: spec.fn(spark, SF_DIR).collect())
        print(f"  {name}: {queries[name]}s", file=sys.stderr)

    # BASELINE-comparable: brute-force L2 top-10 over N_VEC x 768.
    # Back to default 128MB splits here: the synthetic table is ~600 MB
    # and 4MB splits (set above for the small star tables) would mean
    # 192 tasks x per-task overhead for a 32-core scan.
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
    t0 = time.perf_counter()
    vecs = synth_vectors(spark, N_VEC, DIM)
    print(f"  synth_vectors({N_VEC}x{DIM}): {time.perf_counter()-t0:.1f}s", file=sys.stderr)
    qvec = [round(((j * 13) % 17 - 8) / 8.0, 6) for j in range(DIM)]

    bench_path = f"/tmp/laion_bench_{N_VEC}x{DIM}.parquet"

    def run_knn(impl):
        if impl == "scan":
            return knn_search_parquet(
                spark, bench_path, qvec, k=10, vector_col="embedding", select=["id"]
            ).collect()
        return knn_search(
            vecs, qvec, k=10, vector_col="embedding", select=["id"], tiebreak=["id"], impl=impl
        ).collect()

    # 5 runs: median recorded in queries{}, best + best-run rows/s as
    # separate fields. Wall times on this host swing 5-30x under
    # neighbor CPU contention; best-of-N is the contention-resistant
    # throughput bound, the median the honest typical case.
    variants = [("scan", "knn768")]
    if os.environ.get("SPARK_GRAFT_BENCH_CODEGEN"):  # JVM expression path
        variants.append(("codegen", "knn768_codegen"))  # ~6s/200k: opt-in
    if os.environ.get("SPARK_GRAFT_BENCH_ARROW"):  # opt-in: can run 10+ min
        variants.append(("arrow", "knn768_arrow"))  # under host contention
    extras: dict[str, float | int] = {}
    for impl, key in variants:
        run_knn(impl)  # warm (codegen compile / python workers)
        ts = sorted(timed(lambda: run_knn(impl)) for _ in range(5))
        queries[key] = ts[2]
        extras[f"{key}_best_sec"] = ts[0]
        extras[f"{key}_rows_per_sec"] = round(N_VEC / ts[0])
        print(f"  {key}: {ts}", file=sys.stderr)

    total = round(sum(queries.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_suite_total",
                "value": total,
                "unit": "sec",
                "queries": queries,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "knn768_rows": N_VEC,
                "knn768_rows_per_sec_median": round(N_VEC / queries["knn768"]),
                **extras,  # {impl}_best_sec + {impl}_rows_per_sec (best-of-5)
            }
        )
    )


if __name__ == "__main__":
    main()
