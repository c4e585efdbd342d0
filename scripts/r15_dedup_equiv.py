"""r15: output-equivalence check for the dedup optimizations.

Compares the WORKING-TREE minhash_lsh_pairs / containment_pairs
outputs against the pre-round implementation (imported from a git
worktree at the round-start commit, passed as argv[1]) on the bench
doc fixture recipe at a small scale, plus the d04 catalog shape
(ngram=1) where values must be BIT-identical.

Usage: python scripts/r15_dedup_equiv.py /path/to/old_tree [n_docs]
"""
import os
import sys
import time

NEW_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OLD_ROOT = sys.argv[1]
N_DOCS = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000

sys.path.insert(0, NEW_ROOT)
from laion_spark.session import get_session  # noqa: E402

spark = get_session("r15_dedup_equiv")

# bench fixture recipe at small scale (same generator as ensure_docs)
base = N_DOCS // 5
docs = (
    spark.range(N_DOCS)
    .repartition(8)
    .selectExpr(
        "id AS doc_id",
        f"CASE WHEN id < {2 * base} THEN pmod(id, {base}) ELSE id END AS base_key",
    )
    .selectExpr(
        "doc_id",
        "concat_ws(' ', transform(sequence(1, 40), "
        " i -> concat('w', pmod(xxhash64(base_key, i), 5000)))) AS base",
    )
    .selectExpr(
        "doc_id",
        f"CASE WHEN doc_id >= {base} AND doc_id < {2 * base} "
        "THEN concat(base, ' x', pmod(doc_id, 97)) ELSE base END AS text",
    )
    .cache()
)
docs.count()


def load(root, name):
    import importlib
    saved = dict(sys.modules)
    for m in list(sys.modules):
        if m == "laion_spark" or m.startswith("laion_spark."):
            del sys.modules[m]
    sys.path.insert(0, root)
    try:
        mod = importlib.import_module("laion_spark.operators.dedup")
        fn = getattr(mod, name)
    finally:
        sys.path.remove(root)
        for m in list(sys.modules):
            if m == "laion_spark" or m.startswith("laion_spark."):
                del sys.modules[m]
        sys.modules.update(saved)
    return fn


def rows(df):
    return sorted(tuple(r) for r in df.collect())


ok = True
for name, kw in [
    ("minhash_lsh_pairs", dict(num_hashes=32, bands=8, threshold=0.8)),       # bench ngram=3
    ("minhash_lsh_pairs", dict(num_hashes=32, bands=16, ngram=1, threshold=0.5)),  # d04 shape
    ("containment_pairs", dict(ngram=3, threshold=0.999, max_df=8,
                               hash_shingles=True, expand_buckets=True)),     # contain1m shape
    ("containment_pairs", dict(ngram=1, top=25)),                              # d12 shape
]:
    old_fn = load(OLD_ROOT, name)
    new_fn = load(NEW_ROOT, name)
    t0 = time.perf_counter(); old = rows(old_fn(docs, "doc_id", "text", **kw)); t_old = time.perf_counter() - t0
    t0 = time.perf_counter(); new = rows(new_fn(docs, "doc_id", "text", **kw)); t_new = time.perf_counter() - t0
    same = old == new
    ok &= same
    print(f"{name} {kw}: match={same} n_old={len(old)} n_new={len(new)} "
          f"t_old={t_old:.1f}s t_new={t_new:.1f}s", flush=True)
    if not same:
        so, sn = set(old), set(new)
        print("  only-old:", list(so - sn)[:5])
        print("  only-new:", list(sn - so)[:5])

# d04 signature bit-parity at ngram=1
old_sig = load(OLD_ROOT, "minhash_signatures")
new_sig = load(NEW_ROOT, "minhash_signatures")
a = rows(old_sig(docs.limit(2000), "doc_id", "text", num_hashes=32, ngram=1))
b = rows(new_sig(docs.limit(2000), "doc_id", "text", num_hashes=32, ngram=1))
sig_same = a == b
ok &= sig_same
print(f"minhash_signatures ngram=1 bit-parity: {sig_same}")

print("ALL MATCH" if ok else "MISMATCH", flush=True)
spark.stop()
sys.exit(0 if ok else 1)
