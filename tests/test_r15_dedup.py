"""r15 dedup-optimization contracts (VERDICT r14 next-round #3).

The round rewrote minhash_signatures' inner loop (numpy mapInArrow),
switched the n>=2 shingle-hash basis to token-hash tuples
(hashed_shingles), and moved the LSH verify semi-join BEFORE the
shingle transform. These pin the invariants those changes promised.
"""

from pyspark.sql import functions as F


def _docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog again today"),
        (1, "the quick brown fox jumps over the lazy dog again today ok"),
        (2, "a completely different document with its own words here now"),
        (3, "short one"),        # < 3 tokens of trigram shingles? 2 tokens -> none
        (4, ""),                 # empty
        (5, None),               # NULL text
        (6, "the quick brown fox jumps over the lazy dog again today"),  # dup of 0
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_hashed_shingles_unigram_matches_string_hash(spark):
    """For n == 1 the hashed basis must be BIT-identical to hashing the
    string shingles — the d04 catalog entry rides this equality."""
    from laion_spark.operators.dedup import hashed_shingles, shingles

    df = _docs(spark)
    both = df.select(
        F.transform(shingles("text", 1), lambda s: F.xxhash64(s)).alias("a"),
        hashed_shingles("text", 1).alias("b"),
    ).collect()
    for r in both:
        assert r.a == r.b


def test_hashed_shingles_trigram_set_cardinalities_match(spark):
    """The token-tuple basis must produce exactly one hash per distinct
    string shingle (tokens carry no whitespace, so tuple equality ==
    string equality): same set sizes, same pairwise intersections."""
    from laion_spark.operators.dedup import hashed_shingles, shingles

    df = _docs(spark)
    rows = df.select(
        F.col("doc_id"),
        F.size(shingles("text", 3)).alias("ns"),
        F.size(hashed_shingles("text", 3)).alias("nh"),
    ).collect()
    for r in rows:
        assert r.ns == r.nh, (r.doc_id, r.ns, r.nh)
    # pairwise intersection parity on the near-dup pair (0, 1)
    s = {r.doc_id: r.sh for r in df.select("doc_id", shingles("text", 3).alias("sh")).collect()}
    h = {r.doc_id: r.sh for r in df.select("doc_id", hashed_shingles("text", 3).alias("sh")).collect()}
    assert len(set(s[0]) & set(s[1])) == len(set(h[0]) & set(h[1]))


def test_minhash_signature_empty_null_contract(spark):
    """Empty/NULL shingle sets must still yield a NULL-element signature
    (the pre-r15 array_min behavior) through the mapInArrow path, and
    real signatures must be within [0, M)."""
    from laion_spark.operators.dedup import _MERSENNE, minhash_signatures

    df = _docs(spark)
    got = {r.id: r.signature for r in
           minhash_signatures(df, "doc_id", "text", num_hashes=8, ngram=3).collect()}
    assert len(got) == 7
    for did in (3, 4, 5):  # too short / empty / NULL text
        assert got[did] is None or all(v is None for v in got[did]), (did, got[did])
    for did in (0, 1, 2, 6):
        assert all(v is not None and 0 <= v < _MERSENNE for v in got[did])
    # identical docs get identical signatures
    assert got[0] == got[6]
    # near-dups agree on most hash slots, the distinct doc does not
    agree01 = sum(1 for a, b in zip(got[0], got[1]) if a == b)
    agree02 = sum(1 for a, b in zip(got[0], got[2]) if a == b)
    assert agree01 > agree02


def test_minhash_lsh_verify_prunes_before_shingling(spark):
    """The verify stage must semi-join candidate ids BEFORE computing
    the hashed-shingle arrays: the plan's second shingle computation
    has to sit ABOVE the semi-join, not below it."""
    from laion_spark.operators.dedup import minhash_lsh_pairs

    df = _docs(spark)
    out = minhash_lsh_pairs(df, "doc_id", "text", num_hashes=16, bands=8, threshold=0.8)
    plan = out._sc._jvm.PythonSQLUtils.explainString(out._jdf.queryExecution(), "formatted")
    assert "LeftSemi" in plan
    got = {(r.da, r.db) for r in out.collect()}
    assert (0, 6) in got  # identical pair survives end to end
