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


def test_large_scrambled_input_consistent_across_jobs(spark):
    """Regression for the repartitionByRange design: with 20k rows the
    offsets job and the output job used to disagree on partition ids
    (re-sampled range boundaries) and ~85% of prefix values came back
    wrong. Literal-boundary bucketing must make both jobs agree."""
    rows = [(k * 7919 % 20011, 1) for k in range(20011)]  # unique keys, scrambled
    big = spark.createDataFrame(rows, "k int, v bigint").repartition(16)
    got = {
        r.k: r.ps
        for r in global_prefix_sum(big, ["k"], "v", "ps", num_partitions=16).collect()
    }
    # v==1 everywhere, so the exclusive prefix of row k is exactly k
    assert len(got) == 20011
    bad = [k for k, ps in got.items() if ps != k]
    assert not bad, f"{len(bad)} wrong prefixes, e.g. {sorted(bad)[:5]}"


def test_decimal_value_column_stays_exact(spark):
    """The engine's money-sum convention is DECIMAL(18,6); offsets must
    accumulate as exact decimals, not drift through double."""
    from decimal import Decimal

    rows = [(k, Decimal(f"{k}.000001")) for k in range(200)]
    df = spark.createDataFrame(rows, "k int, v decimal(18,6)").repartition(8)
    out = global_prefix_sum(df, ["k"], "v", "ps", exclusive=False, num_partitions=5)
    got = {r.k: r.ps for r in out.collect()}
    run = Decimal(0)
    for k in range(200):
        run += Decimal(f"{k}.000001")
        assert got[k] == run, (k, got[k], run)


def test_date_order_column(spark):
    import datetime as dt

    rows = [(dt.date(2024, 1, 1) + dt.timedelta(days=k * 13 % 97), k) for k in range(97)]
    df = spark.createDataFrame(rows, "d date, v bigint").repartition(4)
    got = sorted(
        (r.d, r.ps)
        for r in global_prefix_sum(df, ["d"], "v", "ps", num_partitions=6).collect()
    )
    run = 0
    for (d, ps), (_, v) in zip(got, sorted(rows)):
        assert ps == run
        run += v


def test_string_order_column_rejected(spark):
    df = spark.createDataFrame([("a", 1)], "k string, v bigint")
    with pytest.raises(ValueError, match="numeric/date/timestamp"):
        global_prefix_sum(df, ["k"], "v")


def test_no_single_partition_exchange(df):
    """The whole point: the plan must not gather all rows onto one
    partition the way sum() OVER (ORDER BY k) does."""
    out = global_prefix_sum(df, ["k"], "vi", "ps", num_partitions=7)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan, plan


def test_null_order_key_raises_clearly(spark):
    """A NULL first order key has no place in a total order — it must
    raise a named ValueError, not the old opaque sorted(None, int)
    TypeError from the offsets pass (ADVICE r4)."""
    df = spark.createDataFrame([(1, 10), (None, 20), (3, 30)], "k int, v bigint")
    with pytest.raises(ValueError, match="NULL"):
        global_prefix_sum(df, ["k"], "v")


def test_helper_columns_do_not_clobber_user_columns(spark):
    """Input columns named _ord/_b/_local/_off must survive untouched —
    the operator's internal columns pick collision-free names
    (ADVICE r4: withColumn silently replaced same-named user columns)."""
    rows = [(k, k + 1, f"u{k}", k * 2, k * 3, k * 4) for k in range(20)]
    df = spark.createDataFrame(rows, "k int, v bigint, _ord string, _b int, _local int, _off int")
    out = global_prefix_sum(df, ["k"], "v", "ps", num_partitions=3).collect()
    assert {c for c in ("_ord", "_b", "_local", "_off")} <= set(
        global_prefix_sum(df, ["k"], "v", "ps", num_partitions=3).columns
    )
    by_k = {r.k: r for r in out}
    run = 0
    for k in range(20):
        r = by_k[k]
        assert (r._ord, r._b, r._local, r._off) == (f"u{k}", k * 2, k * 3, k * 4)
        assert r.ps == run
        run += k + 1


def test_1024_buckets_log_depth_plan(spark):
    """VERDICT r4 #6 'done' criterion: at 1,024 requested buckets the
    bucket assignment must stay ONE balanced expression (log-depth when
    tree, not a 1,023-comparison predicate chain) and the plan must
    still have no Exchange SinglePartition. Correctness is checked
    against the driver-side running sum."""
    n = 4096
    rows = [(k * 2654435761 % n, 1) for k in range(n)]  # unique keys, scrambled
    df = spark.createDataFrame(rows, "k bigint, v bigint").repartition(16)
    out = global_prefix_sum(df, ["k"], "v", "ps", num_partitions=1024)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan, plan
    got = {r.k: r.ps for r in out.collect()}
    for i, k in enumerate(sorted(got)):
        assert got[k] == i  # exclusive running count of strictly-smaller keys

    # "stays one expression": bucketing adds NO exchange of its own —
    # the only exchanges are the per-bucket window shuffle and the
    # broadcast of the offsets table (log-depth matters for per-row
    # cost, which the correctness pass above exercises at 1,023
    # boundary literals without codegen falling over)
    data_exchanges = [
        ln for ln in plan.splitlines() if "Exchange" in ln and "Broadcast" not in ln
    ]
    assert len(data_exchanges) <= 2, plan


def test_multi_column_matches_chained_calls(df):
    """r15 fusion contract: N value columns in ONE call must produce
    exactly the values of N chained single-column calls (same order,
    same exclusivity), while sharing one bucketing/window pass."""
    chained = global_prefix_sum(df, ["k"], "vi", "pi", exclusive=False, num_partitions=7)
    chained = global_prefix_sum(chained, ["k"], "vd", "pd", exclusive=False, num_partitions=7)
    want = {r.k: (r.pi, r.pd) for r in chained.collect()}
    fused = global_prefix_sum(
        df, ["k"], ["vi", "vd"], ["pi", "pd"], exclusive=False, num_partitions=7
    )
    # the fusion's point: one data exchange for the bucket window (plus
    # the fixture's own repartition), not one per value column — read
    # the plan BEFORE execution so AQE doesn't print initial+final twice
    plan = fused._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan, plan
    data_exchanges = [
        ln for ln in plan.splitlines() if "Exchange" in ln and "Broadcast" not in ln
    ]
    assert len(data_exchanges) <= 2, plan
    got = {r.k: (r.pi, r.pd) for r in fused.collect()}
    assert got == want


def test_multi_column_mixed_types_and_arity_guard(spark):
    """Per-column offset dtypes must hold in the fused form (bigint and
    double side by side), and a value/out arity mismatch must raise."""
    import pytest as _pytest

    rows = [(k, k + 1, float(k) / 4) for k in range(50)]
    df = spark.createDataFrame(rows, "k int, vi bigint, vd double").repartition(4)
    out = global_prefix_sum(df, ["k"], ["vi", "vd"], ["pi", "pd"], num_partitions=5)
    got = {r.k: (r.pi, r.pd) for r in out.collect()}
    ri, rd = 0, 0.0
    for k in range(50):
        assert got[k] == (ri, rd), (k, got[k], (ri, rd))
        ri += k + 1
        rd += float(k) / 4
    with _pytest.raises(ValueError, match="output names"):
        global_prefix_sum(df, ["k"], ["vi", "vd"], ["pi"])
