"""Mergeable aggregate state (ClickHouse -State/-Merge parity):
q38's oracle pins merged-vs-recompute for the algebraic aggregates;
these pin the sketch path and the merge algebra itself."""

from pyspark.sql import functions as F

from laion_spark.operators.aggstate import agg_state, finalize, merge_states
from tests.conftest import SF_DIR


def test_sketch_merge_equals_single_pass(spark):
    """Union of per-shard HLL sketches must give EXACTLY the same
    estimate as one sketch over everything (Datasketches union is
    deterministic), and land within 2% of the exact distinct count."""
    e = spark.read.parquet(f"{SF_DIR}/events.parquet")
    shards = [e.filter(f"event_id % 3 = {i}") for i in range(3)]
    states = [agg_state(s, ["event_type"], [], ["user_id"]) for s in shards]
    u = states[0]
    for s in states[1:]:
        u = u.unionAll(s)
    merged = merge_states(u, ["event_type"], [], ["user_id"])
    got = {
        r.event_type: r.user_id_uniq
        for r in finalize(merged, ["event_type"], [], ["user_id"]).collect()
    }

    single = finalize(
        agg_state(e, ["event_type"], [], ["user_id"]), ["event_type"], [], ["user_id"]
    )
    want = {r.event_type: r.user_id_uniq for r in single.collect()}
    assert got == want  # merge-of-partials == one pass, exactly

    exact = {
        r.event_type: r.n
        for r in e.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for k, est in got.items():
        assert abs(est - exact[k]) / exact[k] < 0.02


def test_state_roundtrip_through_parquet(spark, tmp_path):
    """The AggregatingMergeTree story requires states to survive
    persistence: write shard states to parquet, read back, merge —
    same result as merging in memory."""
    e = spark.read.parquet(f"{SF_DIR}/events.parquet")
    s1, s2 = e.filter("event_id % 2 = 0"), e.filter("event_id % 2 = 1")
    st1 = agg_state(s1, ["event_type"], ["value"], ["user_id"])
    st2 = agg_state(s2, ["event_type"], ["value"], ["user_id"])

    p = str(tmp_path / "states")
    st1.write.mode("overwrite").parquet(p)
    st2.write.mode("append").parquet(p)
    from_disk = finalize(
        merge_states(spark.read.parquet(p), ["event_type"], ["value"], ["user_id"]),
        ["event_type"], ["value"], ["user_id"],
    )
    in_mem = finalize(
        merge_states(st1.unionAll(st2), ["event_type"], ["value"], ["user_id"]),
        ["event_type"], ["value"], ["user_id"],
    )
    canon = lambda df: sorted(tuple(str(v) for v in r) for r in df.collect())
    assert canon(from_disk) == canon(in_mem)


def test_merge_is_order_and_grouping_insensitive(spark):
    """Associativity/commutativity: ((s1+s2)+s3) == ((s3+s1)+s2)."""
    e = spark.read.parquet(f"{SF_DIR}/events.parquet")
    sh = [e.filter(f"event_id % 3 = {i}") for i in range(3)]
    st = [agg_state(s, ["event_type"], ["value"], []) for s in sh]

    a = merge_states(
        merge_states(st[0].unionAll(st[1]), ["event_type"], ["value"]).unionAll(st[2]),
        ["event_type"], ["value"],
    )
    b = merge_states(
        merge_states(st[2].unionAll(st[0]), ["event_type"], ["value"]).unionAll(st[1]),
        ["event_type"], ["value"],
    )
    canon = lambda df: sorted(
        tuple(str(v) for v in r)
        for r in finalize(df, ["event_type"], ["value"]).collect()
    )
    assert canon(a) == canon(b)
