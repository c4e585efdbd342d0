from laion_spark.streaming.windows import (
    replay_as_stream,
    run_to_completion,
    sessionized_counts,
    sliding_counts,
    streaming_dedup,
    tumbling_counts,
)

__all__ = [
    "replay_as_stream",
    "run_to_completion",
    "sessionized_counts",
    "sliding_counts",
    "streaming_dedup",
    "tumbling_counts",
]
