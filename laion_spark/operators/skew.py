"""Skew-resistant shuffles: explicit key salting for joins and
two-phase aggregation for hot grouping keys.

The reference's server sidesteps skew by being single-node (every
ClickHouse aggregation runs on one box; /root/reference/search.py
issues plain SQL the server executes locally). On a 1000-executor
cluster reading 100 TB, a shuffle keyed on a power-law column (user id,
event type, URL host) sends one key's entire row set to one reducer —
the straggler that dominates the stage.

Two mitigations, layered:

  1. AQE first. ``tune_session`` enables
     ``spark.sql.adaptive.skewJoin.enabled``: at runtime Spark splits an
     oversized shuffle partition into chunks and replicates the matching
     partition of the other side. It is free and handles most skew; it
     applies to sort-merge/shuffled-hash JOINS only, after thresholds.
  2. Explicit salting (this module) when the operator is an
     aggregation (AQE skew handling does not apply), when a single
     key's group must never materialize in one task (windowed
     collect), or when the engine runs without AQE.

Salting never changes results: ``salted_join`` output equals the plain
join's (the salt is an internal column, dropped before return), and
``salted_agg`` is restricted to algebraic aggregates that compose
across the partial/final split.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame, functions as F

#: internal salt column name — dropped before results are returned
SALT = "_skew_salt"


def _as_list(on: str | Sequence[str]) -> list[str]:
    return [on] if isinstance(on, str) else list(on)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    how: str = "inner",
    n_salts: int = 16,
    salt_seed: int = 42,
) -> DataFrame:
    """Equi-join where ``left`` is the SKEWED side: each left row gets a
    uniform salt in ``[0, n_salts)`` appended to its join key, and every
    right row is replicated once per salt value, so a hot key's rows
    spread over ``n_salts`` reducers instead of one.

    Cost model: the right side is shuffled ``n_salts`` times over
    (bytes-wise: replicated, then hashed on key+salt). Use when
    ``right`` is too big to broadcast (a broadcast join has no skew
    problem at all — prefer it when the dim fits) but much smaller than
    the skewed fact side, the regime where one straggler reducer costs
    more than an n_salts-fold dim replication.

    Supported ``how``: inner, left/left_outer, left_semi, left_anti —
    the shapes where replicating ``right`` cannot duplicate or drop a
    left row (each left row carries ONE salt, so it meets exactly one
    replica of each matching right row). For right/full joins swap the
    inputs or fall back to AQE.
    """
    keys = _as_list(on)
    how_norm = how.replace("outer", "").rstrip("_").lower()
    if how_norm not in ("inner", "left", "left_semi", "left_anti", "leftsemi", "leftanti", "semi", "anti"):
        raise ValueError(
            f"salted_join supports inner/left/left_semi/left_anti, got {how!r}: "
            "replicating the right side under right/full joins would duplicate "
            "unmatched right rows (one per salt)"
        )
    if n_salts < 2:
        raise ValueError(f"n_salts must be >= 2, got {n_salts}")
    # Any salt assignment is correct (the salt only spreads rows); a
    # seeded uniform draw avoids correlating the salt with data values,
    # which a hash-of-columns salt would do for duplicate rows.
    salted_left = left.withColumn(
        SALT, (F.rand(salt_seed) * n_salts).cast("int")
    )
    replicas = right.withColumn(
        SALT, F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    joined = salted_left.join(replicas, on=keys + [SALT], how=how)
    return joined.drop(SALT)


def salted_agg(
    df: DataFrame,
    group_by: str | Sequence[str],
    aggs: Mapping[str, Column],
    n_salts: int = 16,
    salt_seed: int = 42,
) -> DataFrame:
    """Two-phase aggregation for skewed grouping keys: partial-aggregate
    on (key, salt), then final-aggregate on key — a hot key's billions
    of rows reduce to ``n_salts`` partial rows before the second (tiny)
    shuffle.

    ``aggs`` maps output column name -> a partial aggregate expression
    over the input columns. The final merge re-aggregates the partials:
    ``sum``/``count`` partials are summed, ``min``/``max`` partials are
    min'd/max'd — detected from the partial expression via ``_merge``
    hints. Only algebraic aggregates compose this way; pass
    non-algebraic work (medians, collect) through ``n_salts`` partials
    explicitly or use a sketch.

    Note Spark's own hash aggregate already does map-side partial
    aggregation, which de-skews PERFECTLY when the pre-shuffle
    partition count is high — this helper exists for the cases that
    defeat it: high-cardinality composite keys alongside one hot key
    (partial hash tables spill), or aggregation buffers too wide to
    keep per-key per-task.
    """
    keys = _as_list(group_by)
    partial_cols = []
    merge_cols = []
    for name, spec in aggs.items():
        expr, merge = spec if isinstance(spec, tuple) else (spec, "sum")
        partial_cols.append(expr.alias(name))
        merge_fn = {"sum": F.sum, "min": F.min, "max": F.max}[merge]
        merge_cols.append(merge_fn(name).alias(name))
    salted = df.withColumn(SALT, (F.rand(salt_seed) * n_salts).cast("int"))
    partial = salted.groupBy(*keys, SALT).agg(*partial_cols)
    return partial.groupBy(*keys).agg(*merge_cols)
