"""Streaming parity (Q28-Q31, FIXTURES.md §7): the events table replayed
as a file stream must produce the same windowed results as the batch
computation of the identical window spec."""

import pytest
from pyspark.sql import functions as F

from laion_spark.streaming.windows import (
    replay_as_stream,
    run_to_completion,
    sessionized_counts,
    sliding_counts,
    streaming_dedup,
    tumbling_counts,
)
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def events_batch(spark):
    from laion_spark.session import tune_session

    tune_session(spark)
    df = spark.read.parquet(f"{SF_DIR}/events.parquet")
    return df.withColumn("ts_t", F.timestamp_micros(F.expr("ts div 1000")))


@pytest.fixture()
def events_stream(spark):
    return replay_as_stream(spark, f"{SF_DIR}/events.parquet", n_splits=4)


def canon(df, cols):
    return sorted(tuple(str(v) for v in r) for r in df.select(*cols).collect())


def test_tumbling_parity(spark, events_batch, events_stream):
    got = run_to_completion(tumbling_counts(events_stream), "t_tumbling")
    want = tumbling_counts(events_batch)
    cols = ["w_start", "event_type", "n", "total"]
    assert canon(got, cols) == canon(want, cols)


def test_sliding_parity(spark, events_batch, events_stream):
    got = run_to_completion(sliding_counts(events_stream), "t_sliding")
    want = sliding_counts(events_batch)
    assert canon(got, ["w_start", "n"]) == canon(want, ["w_start", "n"])


def test_session_parity(spark, events_batch, events_stream):
    got = run_to_completion(sessionized_counts(events_stream), "t_session")
    want = sessionized_counts(events_batch)
    cols = ["s_start", "s_end", "user_id", "n_events"]
    assert canon(got, cols) == canon(want, cols)


def test_streaming_dedup_parity(spark, events_batch, events_stream):
    # within-watermark dedup equals batch dedup only when every
    # duplicate of a key arrives inside the watermark: bucket the key
    # by hour (dup span <= 1h) with a 2h watermark
    keys = ["user_id", "event_type", "hour"]

    def with_hour(df):
        return df.withColumn("hour", F.date_trunc("hour", "ts_t"))

    got = run_to_completion(
        streaming_dedup(with_hour(events_stream), keys, watermark="2 hours").select(*keys),
        "t_dedup",
        output_mode="append",
    )
    want = streaming_dedup(with_hour(events_batch), keys).select(*keys)
    # survivor rows may differ (dedup picks any row); the KEY SET must match
    assert canon(got, keys) == canon(want, keys)
