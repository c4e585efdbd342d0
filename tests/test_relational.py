"""LIMIT BY / dictGet / fixed-width histogram unit semantics — the
catalog oracles (q40/q41/q43) check the fixture answers; these pin the
contract edges on constructed inputs."""

import pytest
from pyspark.sql import functions as F

from laion_spark.operators.relational import dict_get, histogram_fixed, limit_by


def test_limit_by_offset_window(spark):
    df = spark.createDataFrame(
        [("a", i) for i in range(5)] + [("b", 10), ("b", 11)],
        "k string, v int",
    )
    # LIMIT 2 OFFSET 1 BY k, ranked by v desc: a -> {3, 2}, b -> {10}
    out = limit_by(df, ["k"], 2, [F.desc("v")], offset=1)
    got = sorted((r.k, r.v) for r in out.collect())
    assert got == [("a", 2), ("a", 3), ("b", 10)]
    assert "_lb_rn" not in out.columns


def test_limit_by_rejects_bad_args(spark):
    df = spark.createDataFrame([("a", 1)], "k string, v int")
    with pytest.raises(ValueError):
        limit_by(df, ["k"], 0, ["v"])
    with pytest.raises(ValueError):
        limit_by(df, [], 1, ["v"])
    with pytest.raises(ValueError):
        limit_by(df, ["k"], 1, ["v"], offset=-1)


def test_dict_get_default_and_null(spark):
    facts = spark.createDataFrame([(1,), (2,), (3,)], "k int")
    d = spark.createDataFrame([(1, "one", 10), (2, "two", 20)], "dk int, name string, code int")
    out = dict_get(
        facts,
        d,
        key="k",
        dict_key="dk",
        attrs={"name": "name", "code": "code"},
        defaults={"name": "?"},  # code has no default -> NULL on miss
    )
    got = {r.k: (r.name, r.code) for r in out.collect()}
    assert got == {1: ("one", 10), 2: ("two", 20), 3: ("?", None)}


def test_dict_get_guards_oversized_dictionary(spark):
    facts = spark.createDataFrame([(1,)], "k int")
    d = spark.range(100).withColumnRenamed("id", "dk").withColumn("v", F.lit("x"))
    with pytest.raises(ValueError, match="broadcast-sized"):
        dict_get(facts, d, "k", "dk", {"v": "v"}, max_dict_rows=10)


def test_dict_get_plan_is_broadcast_join(spark):
    facts = spark.createDataFrame([(1,)], "k int")
    d = spark.createDataFrame([(1, "one")], "dk int, name string")
    out = dict_get(facts, d, "k", "dk", {"name": "name"})
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_histogram_clamps_out_of_range(spark):
    df = spark.createDataFrame([(-5.0,), (0.0,), (9.9,), (10.0,), (25.0,)], "x double")
    out = histogram_fixed(df, "x", 0.0, 20.0, 2)  # buckets [0,10) [10,20)
    got = {r.bucket: (r.lo, r.hi, r.n) for r in out.collect()}
    # -5 clamps into bucket 0; 25 clamps into bucket 1 (edge bins absorb)
    assert got == {0: (0.0, 10.0, 3), 1: (10.0, 20.0, 2)}


def test_histogram_rejects_bad_args(spark):
    df = spark.createDataFrame([(1.0,)], "x double")
    with pytest.raises(ValueError):
        histogram_fixed(df, "x", 0.0, 10.0, 0)
    with pytest.raises(ValueError):
        histogram_fixed(df, "x", 10.0, 10.0, 4)


def test_sum_map_unions_keys(spark):
    df = spark.createDataFrame(
        [(1, {"a": 1.0, "b": 2.0}), (1, {"b": 3.0}), (2, {"c": 4.0})],
        "g int, m map<string,double>",
    )
    from laion_spark.operators.relational import sum_map

    out = sum_map(df, ["g"], "m")
    got = {r.g: dict(r.m) for r in out.collect()}
    assert got == {1: {"a": 1.0, "b": 5.0}, 2: {"c": 4.0}}


def test_max_intersections_half_open(spark):
    """An interval ending at t must not overlap one starting at t."""
    from laion_spark.operators.funnel import max_intersections

    df = spark.createDataFrame(
        [("a", 0, 10), ("a", 10, 20), ("a", 5, 15), ("b", 0, 1)],
        "k string, s long, e long",
    )
    out = max_intersections(df, "s", "e", by=["k"])
    got = {r.k: r.max_intersections for r in out.collect()}
    # 'a': [0,10) and [5,15) overlap (2); [10,20) starts exactly as [0,10) ends
    assert got == {"a": 2, "b": 1}
    glob = max_intersections(df, "s", "e").collect()
    assert glob[0].max_intersections == 2


def test_interval_length_sum_merges_overlaps(spark):
    from laion_spark.operators.funnel import interval_length_sum

    df = spark.createDataFrame(
        [("a", 0, 10), ("a", 5, 15), ("a", 15, 20), ("a", 30, 31), ("b", 2, 4)],
        "k string, s long, e long",
    )
    out = interval_length_sum(df, "s", "e", by=["k"])
    got = {r.k: r.covered for r in out.collect()}
    # a: [0,15) merged with touching [15,20) = 20, plus [30,31) = 1 -> 21
    assert got == {"a": 21, "b": 2}
    # global union: b's [2,4) lies inside a's merged [0,20) -> 20 + 1
    assert interval_length_sum(df, "s", "e").collect()[0].covered == 21


def test_min_max_map_keywise(spark):
    from laion_spark.operators.relational import sum_map

    df = spark.createDataFrame(
        [("g", {"a": 1.0, "b": 5.0}), ("g", {"a": 3.0, "c": 2.0})],
        "k string, m map<string,double>",
    )
    mn = sum_map(df, ["k"], "m", agg="min").collect()[0].m
    mx = sum_map(df, ["k"], "m", agg="max").collect()[0].m
    assert mn == {"a": 1.0, "b": 5.0, "c": 2.0}
    assert mx == {"a": 3.0, "b": 5.0, "c": 2.0}
    import pytest

    with pytest.raises(ValueError):
        sum_map(df, ["k"], "m", agg="median")
