#!/usr/bin/env python
"""Pinned reproduction: JVM-wide collect_* aggregate deoptimization.

Pure Spark built-ins — no laion_spark code — demonstrating the
pathology documented in README.md and bench.py:dedup_family: after ONE
``sort_array(collect_list(struct(...)))`` aggregation with large
per-group buffers (the funnel/sessionization shape), every later
``collect_set``/``collect_list`` aggregation in the same JVM runs ~4x
slower, permanently. Conf-independent; survives System.gc(); identical
under SortAggregate — consistent with JIT profile pollution of the
shared TypedImperativeAggregate serialize/merge paths, not spill or
planning.

Usage:  python scripts/repro_collect_deopt.py  [rows=4000000]

Prints before/after wall-clock for the SAME collect_set query and the
slowdown ratio (>= ~2x on a 32-core host reproduces the finding; we
measured ~4x at 1M-group scale in the dedup pipelines).

Cluster-scale implication: on long-lived executors, do not co-schedule
large-buffer collect_list stages (funnels) with latency-sensitive
collect_set stages (LSH bucket aggs) — or isolate per-family JVMs, as
bench.py now does via its --dedup-family child process.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    from laion_spark.session import get_session

    spark = get_session("repro_collect_deopt")
    spark.sparkContext.setLogLevel("ERROR")

    # victim query: small-buffer collect_set hash agg (LSH-bucket shape)
    victim = (
        spark.range(rows)
        .selectExpr("pmod(xxhash64(id), 500000) AS k", "id AS v")
        .groupBy("k")
        .agg({"v": "collect_set"})
    )

    def run_victim() -> float:
        t0 = time.perf_counter()
        victim.count()
        return time.perf_counter() - t0

    run_victim()  # codegen warm
    before = min(run_victim() for _ in range(3))

    # poison: ONE large-per-group sort_array(collect_list(struct)) agg —
    # the funnel/sessionization shape (few groups, huge buffers)
    t0 = time.perf_counter()
    (
        spark.range(rows)
        .selectExpr("pmod(id, 64) AS k", "id AS ts", "pmod(id, 7) AS ev")
        .groupBy("k")
        .agg({"*": "count"})
        .count()
    )
    (
        spark.range(rows)
        .selectExpr("pmod(id, 64) AS k", "id AS ts", "cast(pmod(id, 7) as int) AS ev")
        .selectExpr("k", "struct(ts, ev) AS s")
        .groupBy("k")
        .agg({"s": "collect_list"})
        .selectExpr("size(sort_array(`collect_list(s)`)) AS n")
        .count()
    )
    poison_s = time.perf_counter() - t0

    after = min(run_victim() for _ in range(3))
    ratio = after / before if before else float("nan")
    print(
        f"victim collect_set before={before:.2f}s after={after:.2f}s "
        f"ratio={ratio:.2f}x (poison stage itself {poison_s:.1f}s; "
        f"ratio >= ~2x reproduces the JVM-wide deopt)"
    )


if __name__ == "__main__":
    main()
