import math

import pytest
from pyspark.sql import functions as F

from laion_spark.functions import (
    cosine_similarity,
    dot,
    l2_distance,
    l2_distance_sq,
    vec_add,
    vec_lit,
    vec_normalize,
    vec_scale,
    vec_sub,
)


@pytest.fixture(scope="module")
def vdf(spark):
    return spark.createDataFrame(
        [
            (1, [1.0, 2.0, 2.0], [0.0, 0.0, 0.0]),
            (2, [3.0, 4.0, 0.0], [1.0, 1.0, 1.0]),
            (3, None, [1.0, 0.0, 0.0]),
        ],
        "id long, a array<double>, b array<double>",
    )


def row1(df):
    return df.orderBy("id").collect()


def test_l2_distance(vdf):
    rows = row1(
        vdf.select("id", l2_distance("a", "b").alias("d"), l2_distance_sq("a", "b").alias("d2"))
    )
    assert rows[0].d == pytest.approx(3.0)
    assert rows[0].d2 == pytest.approx(9.0)
    assert rows[1].d == pytest.approx(math.sqrt(4 + 9 + 1))
    assert rows[2].d is None


def test_dot_cosine(vdf):
    rows = row1(vdf.select("id", dot("a", "b").alias("p"), cosine_similarity("a", "b").alias("c")))
    assert rows[0].p == 0.0
    assert rows[0].c is None  # zero-norm b -> NULL, not NaN
    assert rows[1].p == pytest.approx(7.0)
    assert rows[1].c == pytest.approx(7.0 / (5.0 * math.sqrt(3.0)))


def test_arithmetic(vdf):
    rows = row1(
        vdf.select(
            "id",
            vec_add("a", "b").alias("s"),
            vec_sub("a", "b").alias("m"),
            vec_scale("a", 2.0, "*").alias("x2"),
            vec_scale("a", 1.0, "r-").alias("inv"),  # scalar-on-left (V4 fix)
        )
    )
    assert rows[1].s == [4.0, 5.0, 1.0]
    assert rows[1].m == [2.0, 3.0, -1.0]
    assert rows[0].x2 == [2.0, 4.0, 4.0]
    assert rows[0].inv == [0.0, -1.0, -1.0]


def test_normalize(vdf):
    rows = row1(vdf.select("id", vec_normalize("a").alias("n"), vec_normalize("b").alias("nb")))
    assert rows[0].n == pytest.approx([1 / 3, 2 / 3, 2 / 3])
    assert rows[0].nb is None  # zero vector


def test_vec_lit_against_column(spark):
    df = spark.range(1).select(l2_distance(vec_lit([1.0, 1.0]), vec_lit([4.0, 5.0])).alias("d"))
    assert df.collect()[0].d == pytest.approx(5.0)


def test_metric_axioms(spark):
    # symmetry + identity + non-negativity on a few vectors
    vs = [[0.1 * i, -0.2 * i, 0.3] for i in range(5)]
    df = spark.createDataFrame(
        [(i, j, vs[i], vs[j]) for i in range(5) for j in range(5)],
        "i long, j long, a array<double>, b array<double>",
    )
    rows = df.select(
        "i", "j", l2_distance("a", "b").alias("dab"), l2_distance("b", "a").alias("dba")
    ).collect()
    for r in rows:
        assert r.dab == pytest.approx(r.dba)
        assert r.dab >= 0.0
        if r.i == r.j:
            assert r.dab == pytest.approx(0.0)
