"""Fresh-JVM A/B of the full dedup pipeline at N docs.

Usage: python scripts/r15_dedup_ab.py <tree_root> [n_docs_millions] [key]
key: dedup (minhash_lsh_pairs) | contain (containment_pairs)
Runs ONLY the full bench action (count) — warm + 2 timed reps — in a
fresh JVM with the bench dedup child's conf (4 MB splits).
"""
import os
import sys
import time

ROOT = sys.argv[1]
N_M = int(sys.argv[2]) if len(sys.argv) > 2 else 10
KEY = sys.argv[3] if len(sys.argv) > 3 else "dedup"

sys.path.insert(0, ROOT)
from laion_spark.session import get_session  # noqa: E402

sys.path.insert(0, ROOT)
import bench  # noqa: E402

spark = get_session("r15_dedup_ab")
spark.conf.set("spark.sql.files.maxPartitionBytes", str(4 * 1024 * 1024))
docs = bench.ensure_docs(spark, N_M * 1_000_000)

if KEY == "dedup":
    from laion_spark.operators.dedup import minhash_lsh_pairs

    def run():
        return minhash_lsh_pairs(docs, "doc_id", "text", num_hashes=32, bands=8,
                                 threshold=0.8).count()
else:
    from laion_spark.operators.dedup import containment_pairs

    def run():
        return containment_pairs(docs, "doc_id", "text", ngram=3, threshold=0.999,
                                 max_df=8, hash_shingles=True, expand_buckets=True).count()

n = run()  # warm
ts = []
for _ in range(2):
    t0 = time.perf_counter()
    run()
    ts.append(round(time.perf_counter() - t0, 2))
print(f"RESULT root={ROOT} key={KEY} n_docs={N_M}M pairs={n} times={sorted(ts)}", flush=True)
spark.stop()
