"""MergeTree-engine FINAL semantics (operators/mergetree.py) + ANY join."""

from laion_spark.operators.mergetree import (
    collapsing_final,
    replacing_final,
    summing_final,
)
from laion_spark.operators.relational import any_left_join

from pyspark.sql import functions as F


def test_replacing_final_keeps_max_version_with_tiebreak(spark):
    df = spark.createDataFrame(
        [
            ("a", 1, 10, "old"),
            ("a", 3, 11, "mid"),
            ("a", 3, 12, "new"),  # version tie -> higher id wins
            ("b", 2, 20, "only"),
        ],
        "k string, ver long, id long, payload string",
    )
    out = replacing_final(df, ["k"], "ver", tiebreak=["id"])
    got = {r.k: (r.ver, r.id, r.payload) for r in out.collect()}
    assert got == {"a": (3, 12, "new"), "b": (2, 20, "only")}


def test_summing_final_decimal_and_integer_paths(spark):
    df = spark.createDataFrame(
        [("a", 0.1, 1), ("a", 0.2, 2), ("b", 1.5, 10)],
        "k string, v double, n long",
    )
    got = {
        r.k: (r.v, r.n)
        for r in summing_final(df, ["k"], ["v", "n"]).collect()
    }
    # 0.1 + 0.2 is exactly 0.3 through the DECIMAL path (not 0.30000000000000004)
    assert got == {"a": (0.3, 3), "b": (1.5, 10)}


def test_collapsing_final_cancel_semantics(spark):
    df = spark.createDataFrame(
        [
            # key a: +1 at t1, cancelled at t2, re-stated at t3 -> survives as t3
            ("a", 1, 1, "s1"),
            ("a", 2, -1, "c1"),
            ("a", 3, 1, "s2"),
            # key b: fully cancelled -> gone
            ("b", 1, 1, "s"),
            ("b", 2, -1, "c"),
            # key c: cancel-only (late cancel, state compacted away) -> gone
            ("c", 5, -1, "c"),
            # key d: a cancel NEWER than the last state row must not resurrect
            # or displace the state pick; net 1 -> survive with t1 row
            ("d", 1, 1, "s"),
            ("d", 2, -1, "c"),
            ("d", 3, 1, "s2"),
            ("d", 4, -1, "c2"),
            ("d", 5, 1, "s3"),
        ],
        "k string, t long, sign int, payload string",
    )
    out = collapsing_final(df, ["k"], "sign", "t")
    got = {r.k: (r.t, r.payload) for r in out.collect()}
    assert got == {"a": (3, "s2"), "d": (5, "s3")}


def test_any_left_join_never_fans_out(spark):
    left = spark.createDataFrame([(1, "x"), (2, "y"), (3, "z")], "k long, l string")
    right = spark.createDataFrame(
        [(1, 9, "late"), (1, 2, "early"), (2, 5, "only")],
        "k long, ord long, r string",
    )
    out = any_left_join(left, right, ["k"], [F.col("ord").asc()])
    assert out.count() == 3  # exactly count(left), no duplication
    got = {r.k: (r.ord, r.r) for r in out.collect()}
    assert got == {1: (2, "early"), 2: (5, "only"), 3: (None, None)}
