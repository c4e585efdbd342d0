"""global_prefix_sum — distributed running sum vs the single-window
reference, plus the no-SinglePartition plan contract."""

import pytest
from pyspark.sql import Window as W, functions as F

from laion_spark.operators.prefix import global_prefix_sum


@pytest.fixture(scope="module")
def df(spark):
    # unique keys, scrambled order, both int and double values
    rows = [(k * 37 % 101, k, float(k % 7) / 2) for k in range(101)]
    return spark.createDataFrame(rows, "k int, vi bigint, vd double").repartition(8)


def reference(df, value_col, exclusive):
    end = -1 if exclusive else 0
    w = W.orderBy("k").rowsBetween(W.unboundedPreceding, end)
    return {
        r.k: r.ps
        for r in df.withColumn(
            "ps", F.coalesce(F.sum(value_col).over(w), F.lit(0))
        ).collect()
    }


@pytest.mark.parametrize("value_col", ["vi", "vd"])
@pytest.mark.parametrize("exclusive", [True, False])
def test_matches_single_window(df, value_col, exclusive):
    got = {
        r.k: r.ps
        for r in global_prefix_sum(
            df, ["k"], value_col, "ps", exclusive=exclusive, num_partitions=7
        ).collect()
    }
    assert got == reference(df, value_col, exclusive)


def test_more_partitions_than_rows(spark):
    small = spark.createDataFrame([(1, 10), (2, 20), (3, 30)], "k int, v bigint")
    got = {r.k: r.ps for r in global_prefix_sum(small, ["k"], "v", "ps").collect()}
    assert got == {1: 0, 2: 10, 3: 30}


def test_no_single_partition_exchange(df):
    """The whole point: the plan must not gather all rows onto one
    partition the way sum() OVER (ORDER BY k) does."""
    out = global_prefix_sum(df, ["k"], "vi", "ps", num_partitions=7)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan, plan
