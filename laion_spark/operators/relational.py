"""ClickHouse query-surface sugar re-expressed as DataFrame transforms:
``LIMIT n BY`` and external-dictionary lookups (``dictGet``).

Reference parity:
  - ``LIMIT BY`` — ClickHouse keeps the first ``n`` rows for each
    distinct value of the BY expressions, after ORDER BY (the reference
    exposes it through plain SQL passed to ``client.query`` — e.g.
    /root/reference/search.py:20-26 builds raw SQL the server executes).
  - ``dictGet('dict', 'attr', key)`` — ClickHouse resolves attributes
    from an in-memory dictionary replicated on every server node. The
    Spark-native analog is a broadcast hash join: the dictionary ships
    once per executor (not per row, not shuffled), and missing keys
    take the declared default, exactly like a dictionary's
    ``<null_value>``.

Scale notes (100 TB):
  - ``limit_by`` is one shuffle on the BY keys, then a per-partition
    window scan. For small ``n`` Spark's WindowGroupLimit pushes the
    limit into the sort (no full materialization per group). Skewed BY
    keys cost what any window does — pre-filter or salt upstream if a
    single key dominates.
  - ``dict_get`` requires the dictionary to be broadcast-sized (same
    contract ClickHouse imposes: dictionaries live in RAM). The fact
    side never shuffles.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame, Window as W, functions as F


def limit_by(
    df: DataFrame,
    by: Sequence[str],
    n: int,
    order_by: Sequence[Column | str],
    offset: int = 0,
) -> DataFrame:
    """ClickHouse ``ORDER BY ... LIMIT [offset,] n BY by...``: keep rows
    ``offset < rank <= offset + n`` per distinct BY-group, ranked by
    ``order_by``. ``order_by`` must be total within each group (include
    a tie-break key) for deterministic results.

    One shuffle on ``by``; the row_number window is whole-stage-codegen
    and (for top-1-ish limits) eligible for WindowGroupLimit pushdown.
    """
    if n <= 0:
        raise ValueError(f"limit_by needs n >= 1, got {n}")
    if offset < 0:
        raise ValueError(f"limit_by offset must be >= 0, got {offset}")
    if not by:
        raise ValueError("limit_by needs at least one BY column")
    w = W.partitionBy(*by).orderBy(
        *[F.col(c) if isinstance(c, str) else c for c in order_by]
    )
    return (
        df.withColumn("_lb_rn", F.row_number().over(w))
        .filter((F.col("_lb_rn") > offset) & (F.col("_lb_rn") <= offset + n))
        .drop("_lb_rn")
    )


def dict_get(
    df: DataFrame,
    dictionary: DataFrame,
    key: str | Column,
    dict_key: str,
    attrs: Mapping[str, str],
    defaults: Mapping[str, object] | None = None,
    max_dict_rows: int = 10_000_000,
) -> DataFrame:
    """ClickHouse ``dictGetOrDefault('d', 'attr', key, default)`` as a
    broadcast left join: every row of ``df`` gains one output column per
    ``attrs[src] = dst`` entry, resolved from ``dictionary`` by matching
    ``key`` against ``dict_key``; misses take ``defaults[dst]`` (NULL if
    unset — plain ``dictGet`` behavior).

    The dictionary must be broadcast-sized — the same RAM-resident
    contract ClickHouse imposes. ``max_dict_rows`` is a guard against
    silently broadcasting a fact table (the failure mode the round-1
    review flagged for knn_join's collect): counting the dictionary once
    is cheap next to shipping it to every executor.
    """
    if not attrs:
        raise ValueError("dict_get needs at least one attribute mapping")
    n_dict = dictionary.count()
    if n_dict > max_dict_rows:
        raise ValueError(
            f"dictionary has {n_dict} rows > max_dict_rows={max_dict_rows}; "
            "a dictGet dictionary must be broadcast-sized — pre-aggregate "
            "it or use a plain join for fact-sized lookups"
        )
    key_col = F.col(key) if isinstance(key, str) else key
    d = dictionary.select(
        F.col(dict_key).alias("_dg_key"),
        *[F.col(src).alias(f"_dg_{dst}") for src, dst in attrs.items()],
    )
    joined = df.join(F.broadcast(d), key_col == F.col("_dg_key"), "left")
    defaults = defaults or {}
    out = [
        (
            F.coalesce(F.col(f"_dg_{dst}"), F.lit(defaults[dst]))
            if dst in defaults
            else F.col(f"_dg_{dst}")
        ).alias(dst)
        for dst in attrs.values()
    ]
    return joined.select(*df.columns, *out)


def sum_map(
    df: DataFrame,
    group_cols: Sequence[str],
    map_col: str,
    exact: bool = True,
    agg: str = "sum",
) -> DataFrame:
    """ClickHouse ``sumMap`` / ``minMap`` / ``maxMap`` parity: per-group,
    combine map values key-wise across rows, producing one map whose
    keys are the union of input keys. Spark-first shape: explode →
    partial-aggregating groupBy on (group, key) → re-assemble with
    ``map_from_entries`` over a sorted entry list. Two shuffles, both on
    narrow (group, key) pairs — never a whole-map shuffle; map-side
    partial aggregation collapses repeated keys before the exchange.

    ``agg`` selects the combinator: ``"sum"`` (default), ``"min"``, or
    ``"max"``. For sums, ``exact=True`` accumulates through
    DECIMAL(18,6) (order-independent across partitions — the engine-wide
    money-sum rule); ``False`` keeps native double sums for throughput.
    min/max are order-independent by construction and ignore ``exact``.

    Returns ``group_cols`` + (``map_col`` map<key, double>).
    """
    if agg not in ("sum", "min", "max"):
        raise ValueError(f"unknown map combinator: {agg!r}")
    keys = list(group_cols)
    kv = df.select(*keys, F.explode(F.col(map_col)).alias("_k", "_v"))
    if agg == "sum":
        total = (
            F.sum(F.col("_v").cast("decimal(18,6)")).cast("double")
            if exact
            else F.sum("_v")
        )
    else:
        total = F.min("_v") if agg == "min" else F.max("_v")
    per_key = kv.groupBy(*keys, "_k").agg(total.alias("_total"))
    return per_key.groupBy(*keys).agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("_k", "_total")))
        ).alias(map_col)
    )


def histogram_fixed(
    df: DataFrame,
    value: str | Column,
    lo: float,
    hi: float,
    buckets: int,
) -> DataFrame:
    """Fixed-width histogram of ``value`` over ``[lo, hi)``: the
    deterministic twin of ClickHouse ``histogram(buckets)(x)`` (whose
    adaptive bin edges are estimation-order-dependent and can never be
    hash-matched across engines — same reasoning as the
    approx_count_distinct bench-only declaration, SURVEY §2.9 Q9).

    Returns one row per non-empty bucket: (bucket int, lo double,
    hi double, n long). Values outside [lo, hi) clamp into the edge
    buckets, like ClickHouse's leftmost/rightmost bins. Single
    aggregation, one shuffle of (bucket, partial count) pairs.
    """
    if buckets <= 0 or not hi > lo:
        raise ValueError("histogram_fixed needs buckets >= 1 and hi > lo")
    v = (F.col(value) if isinstance(value, str) else value).cast("double")
    width = (hi - lo) / buckets
    b = F.least(
        F.greatest(F.floor((v - F.lit(lo)) / F.lit(width)), F.lit(0)),
        F.lit(buckets - 1),
    ).cast("int")
    return (
        df.select(b.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n"))
        .select(
            "bucket",
            (F.lit(lo) + F.col("bucket") * F.lit(width)).alias("lo"),
            (F.lit(lo) + (F.col("bucket") + 1) * F.lit(width)).alias("hi"),
            "n",
        )
    )


def any_left_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    order: Sequence[Column | str],
) -> DataFrame:
    """ClickHouse ``ANY LEFT JOIN``: each left row pairs with *at most
    one* right row per key instead of fanning out over all matches.

    ClickHouse picks whichever right row it meets first (block order —
    non-deterministic on a cluster); the deterministic twin requires an
    explicit ``order`` and keeps its first row per key, mirroring the
    d01 survivor rule. Implementation: the right side collapses to one
    row per key with a WindowGroupLimit-eligible ``row_number`` (one
    shuffle of the right side only), then a plain equi left join — the
    join itself never duplicates left rows, so downstream cardinality
    is exactly ``count(left)``.
    """
    cols = [F.col(c) if isinstance(c, str) else c for c in order]
    w = W.partitionBy(*on).orderBy(*cols)
    first = (
        right.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    return left.join(first, on=list(on), how="left")
