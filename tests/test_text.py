import pytest
from pyspark.sql import functions as F

from laion_spark.functions import text as TX


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the cat sat on the mat and the dog barked at it loudly"),
        (1, "der Hund ist nicht auf der Straße und das ist gut für alle"),
        (2, "el perro es un animal y la casa es una buena idea en general"),
        (3, "你好 世界 这是 一个 测试 文本 你好 世界"),
        (4, "x"),
        (5, "WOW!!! AMAZING??? CLICK NOW!!! FREE $$$ !!!"),
    ]
    return spark.createDataFrame(rows, "id long, text string")


def _one(df, col, cid):
    return {r.id: r.v for r in df.select("id", col.alias("v")).collect()}[cid]


def test_token_stats(spark, docs):
    assert _one(docs, TX.token_count("text"), 0) == 13
    assert _one(docs, TX.token_count("text"), 4) == 1
    assert _one(docs, TX.distinct_token_ratio("text"), 0) < 1.0
    assert _one(docs, TX.avg_token_length("text"), 4) == 1.0


def test_lang_id(spark, docs):
    got = {r.id: r.v for r in docs.select("id", TX.lang_id("text").alias("v")).collect()}
    assert got[0] == "en"
    assert got[1] == "de"
    assert got[2] == "es"
    assert got[3] == "zh"
    assert got[5] == "unknown"


def test_quality_score_ordering(spark, docs):
    q = {r.id: r.v for r in docs.select("id", TX.quality_score("text").alias("v")).collect()}
    assert 0.0 <= min(q.values()) and max(q.values()) <= 1.0
    assert q[0] > q[5]  # clean English prose beats punctuation spam
    assert q[0] > q[4]  # and beats a one-character doc


def test_quality_score_penalizes_overlong(spark):
    """Docs past the 2000-token sweet spot decay instead of pinning at
    1.0 (ADVICE r1: the upper bound was dead code)."""
    base = "the cat sat on a mat and it is that for " * 100  # 1000 tokens
    long = base * 8  # 8000 tokens, same token mix
    df = spark.createDataFrame([(0, base), (1, long)], "id int, text string")
    q = {r.id: r.v for r in df.select("id", TX.quality_score("text").alias("v")).collect()}
    assert q[1] < q[0]
    # length term: 1.0 -> 2000/8000; diversity also shifts a little
    assert q[0] - q[1] == pytest.approx(0.3 * (1.0 - 2000.0 / 8000.0), abs=0.02)


def test_punct_and_upper(spark, docs):
    assert _one(docs, TX.punct_ratio("text"), 0) == pytest.approx(0.0)
    assert _one(docs, TX.punct_ratio("text"), 5) > 0.2
    assert _one(docs, TX.uppercase_ratio("text"), 5) > 0.9
    assert _one(docs, TX.uppercase_ratio("text"), 0) == pytest.approx(0.0)


def test_fingerprints(spark, docs):
    fp = {r.id: r.v for r in docs.select("id", TX.doc_fingerprint("text").alias("v")).collect()}
    assert len(set(fp.values())) == 6  # all distinct
    assert len(fp[0]) == 32  # md5 hex
    rh = docs.select("id", TX.rolling_hashes("text", window=3).alias("v")).collect()
    by_id = {r.id: r.v for r in rh}
    assert len(by_id[0]) == 13 - 2  # n_tokens - window + 1
    assert by_id[4] == []  # shorter than the window -> empty


def test_sequence_packing_conserves_tokens(spark, sf_dir):
    """t12 invariant: bins partition each source's docs — summed
    bin_tokens and docs across bins must equal the per-source totals,
    and bin ids are dense from 0."""
    from laion_spark.catalog import REGISTRY

    from pyspark.sql import functions as F

    out = REGISTRY["t12_sequence_packing"].fn(spark, sf_dir).cache()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    want = {
        r.source: (r.docs, r.toks)
        for r in docs.groupBy("source")
        .agg(F.count("*").alias("docs"), F.sum(F.size(F.split("text", " "))).alias("toks"))
        .collect()
    }
    got = {
        r.source: (r.docs, r.toks)
        for r in out.groupBy("source")
        .agg(F.sum("docs").alias("docs"), F.sum("bin_tokens").alias("toks"))
        .collect()
    }
    assert got == want
    for r in out.groupBy("source").agg(
        F.min("bin").alias("lo"), F.max("bin").alias("hi"), F.count("*").alias("n")
    ).collect():
        assert r.lo == 0 and r.n == r.hi + 1, r  # dense bins
    out.unpersist()


def test_bpe_two_pass_merge_semantics(spark):
    """t24's merge application is a two-pass space-delimited replace
    with ALTERNATING-OCCURRENCE semantics: pass one takes every other
    occurrence in a same-symbol run (the match consumes the middle
    delimiter), pass two the now-isolated rest. This agrees with greedy
    left-to-right BPE on runs up to length 4 but DIVERGES at 5
    (' a a a a a ' -> ' aa a aa ' here vs ' aa aa a ' under canonical
    greedy — ADVICE r11, pinned below). The contract the entry makes is
    not greedy-BPE equivalence but a deterministic chain that DuckDB's
    replace reproduces bit-identically (both engines' replace is
    left-to-right non-overlapping)."""
    import duckdb
    from pyspark.sql import functions as F

    cases = [
        (" a a a ", "a a", " aa a "),
        (" a b a b ", "a b", " ab ab "),
        (" a b a b a b ", "a b", " ab ab ab "),
        (" x a b b y ", "a b", " x ab b y "),
        (" a a a a ", "a a", " aa aa "),
        # run of 5: the first case where alternating-occurrence (this)
        # and greedy BPE (' aa aa a ') disagree — the chosen semantics
        (" a a a a a ", "a a", " aa a aa "),
    ]
    df = spark.createDataFrame(cases, "seq string, pr string, want string")
    pat = F.concat(F.lit(" "), F.col("pr"), F.lit(" "))
    rep = F.concat(
        F.lit(" "), F.replace(F.col("pr"), F.lit(" "), F.lit("")), F.lit(" ")
    )
    got = df.select(
        "want", F.replace(F.replace(F.col("seq"), pat, rep), pat, rep).alias("got")
    ).collect()
    for r in got:
        assert r.got == r.want

    con = duckdb.connect()
    for seq, pr, want in cases:
        merged = pr.replace(" ", "")
        (out,) = con.execute(
            "SELECT replace(replace(?, ?, ?), ?, ?)",
            [seq, f" {pr} ", f" {merged} ", f" {pr} ", f" {merged} "],
        ).fetchone()
        assert out == want
