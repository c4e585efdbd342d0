"""sample_by — ClickHouse SAMPLE-clause semantics: deterministic,
key-coherent, filter-only (scan-side) sampling."""

import pytest
from pyspark.sql import functions as F

from laion_spark.operators.sample import portable_hash32, sample_by
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(f"{SF_DIR}/events.parquet")


def test_deterministic_across_reruns(events):
    a = sorted(r.event_id for r in sample_by(events, "user_id", 0.2).select("event_id").collect())
    b = sorted(r.event_id for r in sample_by(events, "user_id", 0.2).select("event_id").collect())
    assert a == b and 0 < len(a) < events.count()


def test_key_coherent(events):
    """Every user's rows are kept or dropped together."""
    s = sample_by(events, "user_id", 0.3)
    kept = {r.user_id for r in s.select("user_id").distinct().collect()}
    full = events.groupBy("user_id").count().collect()
    s_counts = {r.user_id: r["count"] for r in s.groupBy("user_id").count().collect()}
    for r in full:
        if r.user_id in kept:
            assert s_counts[r.user_id] == r["count"]


def test_fraction_monotone_and_nested(events):
    """SAMPLE 0.1 ⊂ SAMPLE 0.3 — hash-threshold sampling nests."""
    small = {r.user_id for r in sample_by(events, "user_id", 0.1).select("user_id").collect()}
    big = {r.user_id for r in sample_by(events, "user_id", 0.3).select("user_id").collect()}
    assert small <= big


def test_portable_hash_matches_python(spark):
    df = spark.range(1000).select(F.col("id").alias("k"), portable_hash32("id").alias("h"))
    for r in df.collect():
        assert r.h == (r.k * 2654435761) % (1 << 32)


def test_xxhash_method_runs_and_is_coherent(events):
    s = sample_by(events, "user_id", 0.25, method="xxhash", seed=7)
    n = s.count()
    assert 0 < n < events.count()
    # coherence: sampled distinct users' row counts match the full table
    kept = {r.user_id for r in s.select("user_id").distinct().collect()}
    full = {r.user_id: r["count"] for r in events.groupBy("user_id").count().collect()}
    got = {r.user_id: r["count"] for r in s.groupBy("user_id").count().collect()}
    assert all(got[u] == full[u] for u in kept)


def test_bad_args(events):
    with pytest.raises(ValueError):
        sample_by(events, "user_id", 1.5)
    with pytest.raises(ValueError):
        sample_by(events, "user_id", 0.5, method="nope")


def test_negative_keys_sample_proportionally(spark):
    """Regression: plain % follows the dividend's sign, so negative
    keys all hashed below any threshold and a 1% sample kept 100% of
    them. pmod keeps the hash in [0, 2^32) for the full signed range."""
    df = spark.range(-5000, 5000).select(F.col("id").alias("k"))
    n = sample_by(df, "k", 0.1).count()
    assert 500 < n < 1500, n  # ~10% of 10k, not 50%+ (all negatives)
    h = sample_by(df, "k", 0.1, method="xxhash", seed=3).count()
    assert 500 < h < 1500, h


def test_fraction_edges(events):
    total = events.count()
    assert sample_by(events, "user_id", 1.0).count() == total
    assert sample_by(events, "user_id", 1.0, method="xxhash").count() == total
    assert sample_by(events, "user_id", 0.0).count() == 0
    assert sample_by(events, "user_id", 0.0, method="xxhash").count() == 0


def test_filter_reaches_scan_plan(events):
    """The sample predicate is a plain Filter directly over the scan —
    no shuffle, no Python: the 100 TB contract."""
    plan = sample_by(events, "user_id", 0.1)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
