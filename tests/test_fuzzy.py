"""Jaro-Winkler scorer (functions/fuzzy.py, catalog q146): the Python
implementation must be BIT-identical to DuckDB's builtin
``jaro_winkler_similarity`` — the catalog oracle thresholds raw doubles
and floors to micros, so any convention drift (match window, half
transpositions, prefix-bonus threshold) would show as a hash mismatch.

Driver-side parity runs pure Python vs DuckDB at full hypothesis
counts; one Spark-bound test pins the pandas UDF path and the q146
plan shape (broadcast dictionary side).
"""

import duckdb
import pytest
from hypothesis import given, settings, strategies as st

from laion_spark.functions.fuzzy import _jaro, _jaro_winkler

_con = duckdb.connect()


def _duck_jw(a: str, b: str) -> float:
    return _con.execute(
        "SELECT jaro_winkler_similarity(?, ?)", [a, b]
    ).fetchone()[0]


# classic textbook vectors (Winkler 1990 conventions)
@pytest.mark.parametrize(
    "a,b,expect",
    [
        ("martha", "marhta", 0.9611111111111111),
        ("dwayne", "duane", 0.8400000000000001),
        ("dixon", "dicksonx", 0.8133333333333332),
        ("abc", "abc", 1.0),
        ("abc", "", 0.0),
        ("", "", 0.0),  # DuckDB/rapidfuzz convention: empty-vs-empty is 0
        # jaro below the 0.7 boost threshold: NO prefix bonus
        ("axxxxx", "ayyyyy", 0.4444444444444444),
    ],
)
def test_known_vectors(a, b, expect):
    assert _jaro_winkler(a, b) == pytest.approx(expect, abs=1e-15)
    assert _jaro_winkler(a, b) == _duck_jw(a, b)


ascii_word = st.text(
    alphabet=st.sampled_from("abcdefgxyz"), min_size=0, max_size=12
)


@settings(max_examples=500, deadline=None)
@given(a=ascii_word, b=ascii_word)
def test_duckdb_bit_parity(a, b):
    """Exact float equality against DuckDB on random strings — including
    repeats, transposition-heavy pairs, and empty strings."""
    assert _jaro_winkler(a, b) == _duck_jw(a, b)


@settings(max_examples=200, deadline=None)
@given(a=ascii_word, b=ascii_word)
def test_symmetry_and_range(a, b):
    s = _jaro_winkler(a, b)
    assert s == _jaro_winkler(b, a)
    assert 0.0 <= s <= 1.0
    assert _jaro(a, b) <= s + 1e-15  # winkler bonus never decreases


def test_spark_udf_and_plan(spark, sf_dir):
    """q146 end-to-end: pandas UDF scores match driver-side Python, the
    dictionary side broadcasts, and NULLs pass through as NULL."""
    from pyspark.sql import functions as F

    from laion_spark.catalog import REGISTRY
    from laion_spark.functions.fuzzy import jaro_winkler_similarity

    df = REGISTRY["q146_jaro_winkler_match"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    for r in df.collect():
        assert r.jw_micro == int(_jaro_winkler(r.part_word, r.doc_word) * 1_000_000)

    nulls = spark.createDataFrame(
        [("abc", None), (None, "abc"), ("abc", "abd")], "a string, b string"
    ).select(jaro_winkler_similarity("a", "b").alias("s"))
    got = [r.s for r in nulls.collect()]
    assert got[0] is None and got[1] is None
    assert got[2] == pytest.approx(_jaro_winkler("abc", "abd"))


def test_soundex_builtin_matches_oracle_chain(spark):
    """q147's two sides: Spark's builtin soundex() and the portable
    no-backref expression chain the DuckDB oracle runs must agree — on
    the canonical genealogy vectors (incl. the H/W-transparency cases),
    on words STARTING with H/W, and on both testdata vocabularies."""
    from pyspark.sql import functions as F

    from laion_spark.catalog import _soundex_sql

    words = [
        "robert", "rupert", "ashcraft", "ashcroft", "tymczak", "pfister",
        "honeyman", "white", "wheel", "whale", "hwang",
    ]
    con = duckdb.connect()
    vocab = [
        r[0]
        for r in con.execute(
            "SELECT DISTINCT w FROM ("
            "  SELECT unnest(string_split(text, ' ')) AS w"
            "  FROM '/root/testdata/sf0.001/documents.parquet'"
            "  UNION"
            "  SELECT unnest(string_split(p_name, ' '))"
            "  FROM '/root/testdata/sf0.001/part.parquet')"
        ).fetchall()
    ]
    words += vocab
    df = spark.createDataFrame([(w,) for w in words], "w string")
    got = {r.w: r.code for r in df.select("w", F.soundex("w").alias("code")).collect()}
    chain = _soundex_sql("?")
    nparams = chain.count("?")
    for w in words:
        (want,) = con.execute(f"SELECT {chain}", [w] * nparams).fetchone()
        assert got[w] == want, (w, got[w], want)
