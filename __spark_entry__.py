"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The actual engine lives in ``laion_spark/``; the query inventory with
its oracle SQL lives in ``laion_spark/catalog.py`` (one entry per
operator from SURVEY.md §2) — this module only adapts that registry to
the driver's shape.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (reference canonical V7, search.py:20-35): top-10
    nearest neighbors by L2 distance with a predicate below the scoring
    projection, on the sf0.001 embeddings table."""
    from laion_spark.catalog import QVEC64
    from laion_spark.operators.knn import knn_search
    from laion_spark.session import tune_session

    tune_session(spark)
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    return knn_search(
        emb,
        QVEC64,
        k=10,
        vector_col="embedding",
        filter="label <> 0",
        select=["vec_id", "label"],
        tiebreak=["vec_id"],
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from laion_spark.catalog import REGISTRY

    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    from laion_spark.catalog import REGISTRY

    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None}
