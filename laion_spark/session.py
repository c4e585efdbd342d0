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


def _ship_package(spark: SparkSession) -> None:
    """Ship laion_spark to executor Python workers via addPyFile.

    Worker-side closures (mapInPandas/mapInArrow) reference functions
    from this package; workers unpickle them by module reference, so the
    package must be importable there. Locally that only holds when the
    driver's cwd is the repo; on a real cluster it never holds. Zipping
    the package and addPyFile-ing it is the standard, cluster-correct
    fix (and is idempotent per session)."""
    if getattr(spark, "_laion_pkg_shipped", False):
        return
    import tempfile
    import zipfile

    import laion_spark

    pkg_dir = os.path.dirname(os.path.abspath(laion_spark.__file__))
    zpath = os.path.join(tempfile.gettempdir(), f"laion_spark_pkg_{os.getpid()}.zip")
    with zipfile.ZipFile(zpath, "w") as z:
        for root, _dirs, files in os.walk(pkg_dir):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    arc = os.path.join("laion_spark", os.path.relpath(full, pkg_dir))
                    z.write(full, arc)
    try:
        spark.sparkContext.addPyFile(zpath)
    except Exception:
        pass  # e.g. Spark Connect — closures are shipped differently there
    spark._laion_pkg_shipped = True


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
    _ship_package(spark)
    return spark


def _tune_worker_malloc() -> None:
    """Pin glibc so python workers KEEP freed large buffers (r14).

    Measured on this sandbox: first-touch of freshly mapped anonymous
    memory intermittently costs ~100-1100 us PER 4 KB PAGE (the
    hypervisor backs guest pages on demand under host memory
    overcommit), i.e. 10-17 s to touch a fresh 64 MB buffer — while
    re-touching an already-backed buffer costs microseconds. glibc's
    default M_MMAP_THRESHOLD (<=32 MB) mmap/munmaps every larger
    allocation, so each numpy temporary in the scorer/generator hot
    loops could re-fault its whole footprint every call. Disabling
    trim and raising the mmap threshold to 256 MB keeps those buffers
    in the arena: each worker pays first-touch once per working-set
    byte and never again. Env must be set BEFORE a process starts
    (glibc reads it at startup) — setting it here, before the JVM
    spawns, propagates JVM -> python daemon -> every worker. Harmless
    on healthy hosts (slightly higher steady-state RSS)."""
    os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", "-1")
    os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", str(256 * 1024 * 1024))


def get_session(app_name: str = "laion_spark", cpus: int | None = None) -> SparkSession:
    """Create (or fetch) a local session tuned for this engine.

    On a real cluster the master/memory settings come from
    spark-submit; only the runtime confs in ``tune_session`` apply.
    """
    _tune_worker_malloc()
    n = cpus or default_parallelism()
    mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g")
    builder = (
        SparkSession.builder.master(f"local[{n}]")
        .appName(app_name)
        .config("spark.driver.memory", mem)
        # Xms == Xmx: G1 never uncommits heap regions, so the JVM too
        # pays this host's slow first-touch (see _tune_worker_malloc)
        # at most once per heap page instead of refaulting after every
        # periodic uncommit
        .config("spark.driver.extraJavaOptions", f"-Xms{mem}")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", str(n))
    )
    for k, v in _RUNTIME_CONF.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return tune_session(spark, shuffle_partitions=n)
