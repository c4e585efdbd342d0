"""sgd_linear_fit — convergence, determinism, and the empty-input guard."""

import pytest
from pyspark.sql import functions as F

from laion_spark.operators.sgd import sgd_linear_fit


def test_recovers_exact_linear_relationship(spark):
    # y = 3x + 0.5 on x in [0, 1]: GD must approach the true params
    df = spark.range(200).select((F.col("id") / 200.0).alias("x"))
    df = df.withColumn("y", 3.0 * F.col("x") + 0.5)
    w, b, n = sgd_linear_fit(df, F.col("x"), F.col("y"), lr=0.5, iters=60)
    assert n == 200
    assert abs(w - 3.0) < 0.05 and abs(b - 0.5) < 0.05, (w, b)


def test_deterministic_across_runs(spark):
    df = spark.range(500).select(
        (F.col("id") / 500.0).alias("x"),
        ((F.col("id") % 7) / 7.0).alias("y"),
    ).repartition(8)
    a = sgd_linear_fit(df, F.col("x"), F.col("y"), iters=5)
    b = sgd_linear_fit(df.repartition(3), F.col("x"), F.col("y"), iters=5)
    assert a == b  # bit-identical regardless of partitioning


def test_empty_input_raises(spark):
    df = spark.range(0).select(F.col("id").cast("double").alias("x"))
    with pytest.raises(ValueError, match="empty"):
        sgd_linear_fit(df, F.col("x"), F.col("x"))
