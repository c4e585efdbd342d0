"""SpaceSaving topK: the catalog oracle (t07) pins the exact regime;
these pin the approximate regime and the merge bookkeeping."""

import pytest
from pyspark.sql import functions as F

from laion_spark.operators.topk import topk_approx


@pytest.fixture(scope="module")
def zipf(spark):
    """~46k rows, zipf-ish: item i (1..200) appears ~20000/i times,
    shuffled deterministically across 8 partitions."""
    n_items = 200
    rows = spark.range(1, n_items + 1).select(
        F.col("id").alias("i"), F.explode(F.sequence(F.lit(1), (20000 / F.col("id")).cast("int"))).alias("_")
    )
    return (
        rows.select(F.concat(F.lit("item"), F.format_string("%03d", "i")).alias("tok"), "i")
        .repartition(8, F.rand(7))
        .cache()
    )


def test_exact_when_capacity_suffices(spark, zipf):
    got = topk_approx(zipf, "tok", k=10, capacity=1024).collect()
    want = (
        zipf.groupBy("tok").agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "tok").limit(10).collect()
    )
    assert [(r.item, r.n) for r in got] == [(r.tok, r.n) for r in want]
    assert all(r.err == 0 for r in got)  # no eviction => exact, and flagged so


def test_heavy_hitters_survive_small_capacity(spark, zipf):
    """capacity 32 over 200 distinct items: SpaceSaving keeps any item
    whose PER-PARTITION count exceeds n_partition/capacity (~410 here);
    items 1-5 (>= 4000 global, ~500+/partition) clear that bar with
    margin, so the true top-5 must appear in the returned top-16."""
    got = topk_approx(zipf, "tok", k=16, capacity=32)
    got_items = {r.item for r in got.collect()}
    true5 = {
        r.tok
        for r in zipf.groupBy("tok").agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "tok").limit(5).collect()
    }
    assert true5 <= got_items


def test_estimate_upper_bounds_true_count(spark, zipf):
    """Per the SpaceSaving invariant, the merged estimate never
    undercounts an item that is present in every partition's sketch,
    and never exceeds true count + summed err."""
    got = {r.item: (r.n, r.err) for r in topk_approx(zipf, "tok", k=5, capacity=32).collect()}
    true = {
        r.tok: r.n
        for r in zipf.groupBy("tok").agg(F.count("*").alias("n")).collect()
    }
    for item, (n, err) in got.items():
        assert true[item] <= n <= true[item] + err


def test_negative_weights_clamped_to_zero(spark):
    """Documented UInt64 contract: a negative weight contributes 0, it
    must not corrupt the SpaceSaving counters into under-bounds."""
    df = spark.createDataFrame(
        [("a", 5), ("a", -100), ("b", 3), ("c", -1)], "tok string, w long"
    )
    got = {
        r.item: r.n
        for r in topk_approx(df, "tok", k=3, capacity=16, weight_col="w").collect()
    }
    assert got.get("a") == 5 and got.get("b") == 3 and got.get("c", 0) == 0
