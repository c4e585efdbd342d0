"""Skew-resistant shuffle operators (operators/skew.py): salting must
be invisible in results and visible in the plan (the shuffle keys
include the salt column)."""

import pytest
from pyspark.sql import functions as F

from laion_spark.operators.skew import SALT, salted_agg, salted_join
from tests.test_plans import plan_str


@pytest.fixture(scope="module")
def skewed(spark):
    """A fact table where one key holds 90% of the rows."""
    return (
        spark.range(2000)
        .select(
            F.when(F.col("id") < 1800, F.lit(7)).otherwise(F.col("id") % 40).alias("k"),
            (F.col("id") * 3 % 101).cast("double").alias("v"),
            F.col("id"),
        )
        .cache()
    )


@pytest.fixture(scope="module")
def dim(spark):
    return spark.range(40).select(
        F.col("id").alias("k"), F.concat(F.lit("g"), F.col("id") % 5).alias("grp")
    )


@pytest.mark.parametrize("how", ["inner", "left", "left_semi", "left_anti"])
def test_salted_join_matches_plain(spark, skewed, dim, how):
    plain = skewed.join(dim, "k", how)
    salted = salted_join(skewed, dim, "k", how=how, n_salts=4)
    assert salted.columns == plain.columns
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_salted_join_rejects_right_joins(skewed, dim):
    with pytest.raises(ValueError, match="inner/left"):
        salted_join(skewed, dim, "k", how="full_outer")


def test_salted_join_shuffles_on_key_plus_salt(spark, skewed, dim):
    """The whole point: the exchange hashes on (k, salt), so one hot k
    spreads over n_salts reducer partitions."""
    j = salted_join(skewed, dim, "k", n_salts=4)
    # disable broadcast so the join actually shuffles (the unit fixture
    # is tiny; at scale the right side exceeds the broadcast threshold)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        p = plan_str(salted_join(skewed, dim, "k", n_salts=4))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert SALT in p, p
    hash_lines = [ln for ln in p.splitlines() if "hashpartitioning" in ln]
    assert any(SALT in ln for ln in hash_lines), p
    # and the salt never leaks into the result schema
    assert SALT not in j.columns


def test_salted_agg_matches_plain(spark, skewed):
    plain = (
        skewed.groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("v").cast("decimal(18,6)")).cast("double").alias("s"),
            F.min("v").alias("mn"),
            F.max("v").alias("mx"),
        )
        .collect()
    )
    salted = salted_agg(
        skewed,
        "k",
        {
            "n": F.count(F.lit(1)),
            "s": F.sum(F.col("v").cast("decimal(18,6)")),
            "mn": (F.min("v"), "min"),
            "mx": (F.max("v"), "max"),
        },
        n_salts=4,
    ).select("k", "n", F.col("s").cast("double").alias("s"), "mn", "mx")
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain))


def test_salted_agg_two_phase_plan(skewed):
    """Partial aggregate keys include the salt; final keys don't."""
    out = salted_agg(skewed, "k", {"n": F.count(F.lit(1))}, n_salts=4)
    p = plan_str(out)
    assert SALT in p
    assert SALT not in out.columns
