"""SparkSession factory and runtime tuning.

Local-mode testing config mirrors a 1000-executor posture: AQE on
(runtime coalesce + skew-join handling), shuffle partitions sized to
cores locally (on a real cluster: 2-3x total cores), Arrow enabled for
every pandas boundary, UTC session timezone so results are comparable
with external engines (parquet timestamps are instants; DuckDB reads
them UTC-naive).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Runtime-settable confs — safe to apply to an externally created
# session (e.g. the verification driver's); everything here can be set
# after startup via spark.conf.set.
_RUNTIME_CONF = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # 768-d float64 embeddings ~6 KB/row: 10k-row Arrow batches keep the
    # Python-boundary transfer ~60 MB per batch worst case.
    "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
    # Spark has no TIMESTAMP(NANOS) type; read nanos as raw bigint
    # (events.parquet uses nanos) and convert explicitly.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
}


def default_parallelism() -> int:
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    if cpus and cpus.isdigit():
        return int(cpus)
    return os.cpu_count() or 8


def tune_session(spark: SparkSession, shuffle_partitions: int | None = None) -> SparkSession:
    """Apply runtime confs to an existing session (idempotent)."""
    for k, v in _RUNTIME_CONF.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # conf locked by the host — keep its value
    n = shuffle_partitions or default_parallelism()
    try:
        spark.conf.set("spark.sql.shuffle.partitions", str(n))
    except Exception:
        pass
    return spark


def get_session(app_name: str = "laion_spark", cpus: int | None = None) -> SparkSession:
    """Create (or fetch) a local session tuned for this engine.

    On a real cluster the master/memory settings come from
    spark-submit; only the runtime confs in ``tune_session`` apply.
    """
    n = cpus or default_parallelism()
    builder = (
        SparkSession.builder.master(f"local[{n}]")
        .appName(app_name)
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", str(n))
    )
    for k, v in _RUNTIME_CONF.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return tune_session(spark, shuffle_partitions=n)
