"""Ordered-event analytics: funnel and retention (ClickHouse's
``windowFunnel`` / ``retention`` aggregate combinators, re-expressed
Spark-first — SURVEY.md §2.8's analytic family; the reference engine
ships these as native aggregate functions for event-stream analysis).

Both operators are a single shuffle on the user key followed by pure
Catalyst expressions — no Python at runtime, no second shuffle:

- ``window_funnel``: per-user events are gathered time-sorted
  (``sort_array(collect_list(struct(t, step)))``) and folded by ONE
  higher-order ``aggregate`` lambda implementing the sliding-chain
  automaton. State per user is N-1 chain-start timestamps — O(steps),
  not O(events) — the same bounded-state trick ClickHouse uses.
- ``retention``: per-user boolean flags, one conditional aggregate
  per condition, ANDed against the base condition.

At 100 TB: both group by the user key once; the fold state is bytes per
user, so skew only matters if a single user has pathological event
counts (cap with a per-user event limit upstream if so).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window as W, functions as F

#: default per-user event-buffer cap for the fold-based sequence ops.
#: The fold STATE is O(steps), but ``collect_list`` buffers all of a
#: user's step events in one task — at 100 TB a single bot user with
#: tens of millions of events would otherwise blow an executor. 100k
#: events is ~1.6 MB of (t, step) structs: far beyond any organic user,
#: small enough to be safe. Pass ``max_events_per_user=None`` to
#: disable (exact unbounded semantics).
DEFAULT_MAX_EVENTS_PER_USER = 100_000


def window_funnel(
    df: DataFrame,
    steps: Sequence[str],
    window_us: int,
    user_col: str = "user_id",
    time_col: str = "ts_us",
    type_col: str = "event_type",
    mode: str | None = None,
    max_events_per_user: int | None = DEFAULT_MAX_EVENTS_PER_USER,
) -> DataFrame:
    """Max funnel level reached per user: the deepest ``k`` such that
    events matching ``steps[0..k-1]`` occur in strictly increasing time
    order with the whole chain inside ``window_us`` of its first event.

    Algorithm (equivalent to the existential SQL semantics whenever a
    user's event times are distinct — keeping the LATEST viable chain
    start at each level dominates: a later start always leaves more
    window slack for the next step, and time-sorted processing
    guarantees step order): fold events in time order, tracking per
    level BOTH the chain start ``s_i`` and the time ``l_i`` of the
    event that reached that level; on a step-1 event set
    ``s1 = l1 = t``; on a step-i event, if ``s_{i-1}`` is set,
    ``t > l_{i-1}`` (STRICTLY later than the previous step's own event,
    not merely the chain start) and ``t - s_{i-1} <= window`` then the
    level-i chain becomes the one with the greater start (ties keep the
    incumbent, whose last-event time is earlier and therefore easier to
    extend). Level = deepest set ``s_i``.

    Tie semantics: an event can never advance a chain whose previous
    step shares its timestamp (ClickHouse ``strict_increase``). With
    tied timestamps ACROSS chains the greedy keeps one chain per level
    (max start, then min last) exactly as ClickHouse's own array of
    per-level (start, last) slots does; the existential SQL oracle and
    this fold agree on any input whose per-user event times are
    distinct (the fixture is sanity-checked for that in tests).

    ``mode`` adds ClickHouse's strictness variants as *declared*
    deterministic semantics (the docs' wording made precise; ClickHouse
    itself resolves in-block ties nondeterministically — here ties
    process in (t, step) ascending order):

    - ``"strict_order"`` — all events participate (matching none of the
      steps codes as step 0). Once a chain has started, any event that
      does not advance an open chain — a step-0 event, a repeated
      step-1, or a step event whose predecessor slot is unset/expired —
      freezes processing; the level reached so far stands ("stops
      finding A->B->C at the D").
    - ``"strict_dedup"`` — an event for a step whose slot is already
      set interrupts further processing (the docs' "repeating event
      interrupts"); the level reached so far stands.

    Both modes add one tinyint to the per-user fold state — still
    O(steps) state, one shuffle, zero Python at runtime.

    ``max_events_per_user`` bounds the per-user event buffer (the fold
    STATE is O(steps), but ``collect_list`` materializes all of a
    user's step events — ClickHouse's windowFunnel has the same O(n)
    buffer). Defaults ON (``DEFAULT_MAX_EVENTS_PER_USER`` = 100k): only
    each user's EARLIEST ``max_events_per_user`` events (by (t, step)
    order, via a ``row_number`` window) enter the fold, so one
    pathological user cannot blow an executor at 100 TB; events past
    the cap are ignored, which can only lower the reported level. The
    window partitions on the same key as the fold's groupBy, so
    EnsureRequirements plans ONE Exchange for both (pinned in
    tests/test_plans.py). Pass ``None`` for unbounded exact semantics.

    Returns (user_col, level int).
    """
    if mode not in (None, "strict_order", "strict_dedup"):
        raise ValueError(f"unknown windowFunnel mode: {mode!r}")
    if max_events_per_user is not None and max_events_per_user < 1:
        raise ValueError("max_events_per_user must be >= 1")
    n = len(steps)
    if n < 2:
        raise ValueError("funnel needs at least 2 steps")
    step_code = F.when(F.col(type_col) == steps[0], 1)
    for i, s in enumerate(steps[1:], start=2):
        step_code = step_code.when(F.col(type_col) == s, i)
    if mode == "strict_order":
        step_code = step_code.otherwise(0)

    ev = df.select(
        F.col(user_col),
        F.col(time_col).cast("long").alias("t"),
        step_code.alias("step"),
    ).filter(F.col("step").isNotNull())
    if max_events_per_user is not None:
        rn = F.row_number().over(
            W.partitionBy(user_col).orderBy("t", "step")
        )
        ev = ev.withColumn("_rn", rn).filter(
            F.col("_rn") <= max_events_per_user
        ).drop("_rn")

    per_user = ev.groupBy(user_col).agg(
        F.sort_array(F.collect_list(F.struct("t", "step"))).alias("evs")
    )

    w = int(window_us)
    # l1 is the step-1 event itself, so s1 doubles as its last-event
    # time; levels 2..n-1 need an explicit l slot (nothing ever
    # advances FROM level n, so l_n is not stored).
    last = {1: "a.s1", **{i: f"a.l{i}" for i in range(2, n)}}
    adv = {
        i: (
            f"(e.step = {i} AND a.s{i-1} >= 0 AND e.t > {last[i-1]} "
            f"AND e.t - a.s{i-1} <= {w})"
        )
        for i in range(2, n + 1)
    }
    if mode == "strict_order":
        # a.s1 >= 0 already excludes chain-starting step-1 events, so
        # "does not advance" reduces to "not an i>=2 advance"
        adv_any = " OR ".join(adv.values())
        frozen = f"(a.d = 1 OR (a.s1 >= 0 AND NOT ({adv_any})))"
    elif mode == "strict_dedup":
        dup_any = " OR ".join(
            f"(e.step = {i} AND a.s{i} >= 0)" for i in range(1, n + 1)
        )
        frozen = f"(a.d = 1 OR {dup_any})"
    else:
        frozen = None

    # field order must mirror the update struct exactly — Spark coerces
    # the fold lambda's struct to the accumulator type positionally
    names = ["s1"]
    for i in range(2, n + 1):
        names.append(f"s{i}")
        if i < n:
            names.append(f"l{i}")
    slots = ", ".join(f"'{s}', CAST(-1 AS BIGINT)" for s in names)
    zero = (
        f"named_struct({slots}, 'd', CAST(0 AS INT))"
        if frozen
        else f"named_struct({slots})"
    )
    gate = f"WHEN {frozen} THEN a.{{slot}} " if frozen else ""
    upd = [
        "'s1', CASE "
        + gate.format(slot="s1")
        + "WHEN e.step = 1 THEN e.t ELSE a.s1 END"
    ]
    for i in range(2, n + 1):
        upd.append(
            f"'s{i}', CASE "
            + gate.format(slot=f"s{i}")
            + f"WHEN {adv[i]} THEN greatest(a.s{i}, a.s{i-1}) ELSE a.s{i} END"
        )
        if i < n:
            # the level-i chain is replaced only when the incoming
            # chain's start strictly beats the incumbent's; equal
            # starts keep the earlier last-event time (easier to
            # extend under strict ordering)
            upd.append(
                f"'l{i}', CASE "
                + gate.format(slot=f"l{i}")
                + f"WHEN {adv[i]} AND a.s{i-1} > a.s{i} THEN e.t "
                f"ELSE a.l{i} END"
            )
    if frozen:
        upd.append(f"'d', CASE WHEN {frozen} THEN 1 ELSE 0 END")
    finish = "CASE " + " ".join(
        f"WHEN a.s{i} >= 0 THEN {i}" for i in range(n, 0, -1)
    ) + " ELSE 0 END"
    fold = (
        f"aggregate(evs, {zero}, (a, e) -> named_struct({', '.join(upd)}), "
        f"a -> CAST({finish} AS INT))"
    )
    return per_user.select(user_col, F.expr(fold).alias("level"))


def sequence_match(
    df: DataFrame,
    steps: Sequence[str],
    window_us: int | None = None,
    user_col: str = "user_id",
    time_col: str = "ts_us",
    type_col: str = "event_type",
) -> DataFrame:
    """ClickHouse ``sequenceMatch('(?1).*(?2)...')`` parity: TRUE per
    user iff the steps occur in strictly increasing time order —
    optionally with the whole chain inside ``window_us`` (ClickHouse's
    pattern has no window; pass None for exact parity). Same fold as
    ``window_funnel``; match == reaching the deepest level.

    Returns (user_col, matched int 0/1).
    """
    w = int(window_us) if window_us is not None else (1 << 62)
    lv = window_funnel(df, steps, w, user_col, time_col, type_col)
    return lv.select(
        user_col, (F.col("level") == len(steps)).cast("int").alias("matched")
    )


def sequence_count(
    df: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    time_col: str = "ts_us",
    type_col: str = "event_type",
    max_events_per_user: int | None = DEFAULT_MAX_EVENTS_PER_USER,
) -> DataFrame:
    """ClickHouse ``sequenceCount('(?1).*(?2)...')`` parity: the number
    of NON-OVERLAPPING complete step chains per user, scanning events in
    time order and restarting the search after each completed chain
    (ClickHouse: "starts to search for the next chain after the current
    chain is matched" — greedy left-to-right, not maximum-disjoint).

    Same single-shuffle shape as ``window_funnel``: one fold, state is
    (current level, last matched time, count) — O(1) per user. A step
    advances only on a strictly later timestamp than the previously
    matched step, mirroring ``sequence_match``. Same default
    ``max_events_per_user`` buffer cap as ``window_funnel``.

    Returns (user_col, n_matches int).
    """
    n = len(steps)
    if n < 2:
        raise ValueError("sequence_count needs at least 2 steps")
    step_code = F.when(F.col(type_col) == steps[0], 1)
    for i, s in enumerate(steps[1:], start=2):
        step_code = step_code.when(F.col(type_col) == s, i)

    ev = df.select(
        F.col(user_col),
        F.col(time_col).cast("long").alias("t"),
        step_code.alias("step"),
    ).filter(F.col("step").isNotNull())
    if max_events_per_user is not None:
        rn = F.row_number().over(W.partitionBy(user_col).orderBy("t", "step"))
        ev = ev.withColumn("_rn", rn).filter(
            F.col("_rn") <= max_events_per_user
        ).drop("_rn")

    per_user = ev.groupBy(user_col).agg(
        F.sort_array(F.collect_list(F.struct("t", "step"))).alias("evs")
    )

    zero = "named_struct('lv', 0, 'lt', CAST(-1 AS BIGINT), 'c', 0)"
    advance = "e.step = a.lv + 1 AND (a.lv = 0 OR e.t > a.lt)"
    upd = (
        f"CASE WHEN {advance} AND a.lv + 1 = {n} "
        "THEN named_struct('lv', 0, 'lt', e.t, 'c', a.c + 1) "
        f"WHEN {advance} "
        "THEN named_struct('lv', a.lv + 1, 'lt', e.t, 'c', a.c) "
        "ELSE a END"
    )
    fold = f"aggregate(evs, {zero}, (a, e) -> {upd}, a -> a.c)"
    return per_user.select(user_col, F.expr(fold).alias("n_matches"))


def max_intersections(
    df: DataFrame,
    start_col: str,
    end_col: str,
    by: Sequence[str] = (),
) -> DataFrame:
    """ClickHouse ``maxIntersections(start, end)`` parity: the maximum
    number of simultaneously-open half-open intervals ``[start, end)``
    (an interval ending at t does not overlap one starting at t).

    Classic sweep: unpivot each interval to (+1 at start, -1 at end)
    deltas, running-sum them in (point, delta) order — ends sort before
    starts at the same instant, which is exactly the half-open rule —
    and take the max. One shuffle on the ``by`` keys; the running max
    is invariant to orderings within tied (point, delta) groups because
    all tied deltas share a sign, so the result is deterministic.

    Returns ``by`` + (max_intersections int); one row per group (a
    single global row when ``by`` is empty).
    """
    keys = list(by)
    pts = df.select(
        *keys, F.col(start_col).cast("long").alias("pt"), F.lit(1).alias("delta")
    ).unionAll(
        df.select(
            *keys, F.col(end_col).cast("long").alias("pt"), F.lit(-1).alias("delta")
        )
    )
    w = (
        (W.partitionBy(*keys) if keys else W.partitionBy())
        .orderBy("pt", "delta")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    open_ = F.sum("delta").over(w)
    agg = pts.select(*keys, open_.alias("open"))
    if keys:
        return agg.groupBy(*keys).agg(F.max("open").cast("int").alias("max_intersections"))
    return agg.agg(F.max("open").cast("int").alias("max_intersections"))


def interval_length_sum(
    df: DataFrame,
    start_col: str,
    end_col: str,
    by: Sequence[str] = (),
) -> DataFrame:
    """ClickHouse ``intervalLengthSum(start, end)`` parity: total length
    covered by the UNION of the intervals (overlaps merged, half-open
    ``[start, end)`` so touching intervals join seamlessly).

    Same +1/−1 sweep as ``max_intersections``: between consecutive sweep
    points, the segment counts iff at least one interval was open before
    it. All arithmetic is integer, so the per-group sum is exact and
    partition-order-proof. Ties contribute zero-length segments, making
    the result deterministic under tied-point permutations. One shuffle
    on the ``by`` keys.

    Returns ``by`` + (covered long).
    """
    keys = list(by)
    pts = df.select(
        *keys, F.col(start_col).cast("long").alias("pt"), F.lit(1).alias("delta")
    ).unionAll(
        df.select(
            *keys, F.col(end_col).cast("long").alias("pt"), F.lit(-1).alias("delta")
        )
    )
    base = (W.partitionBy(*keys) if keys else W.partitionBy()).orderBy("pt", "delta")
    run = F.sum("delta").over(base.rowsBetween(W.unboundedPreceding, W.currentRow))
    seg = F.col("pt") - F.lag("pt").over(base)
    rows = pts.select(
        *keys,
        ((run - F.col("delta")) > 0).alias("open_before"),
        seg.alias("seg"),
    )
    covered = F.coalesce(
        F.sum(F.when(F.col("open_before"), F.col("seg"))), F.lit(0)
    ).alias("covered")
    if keys:
        return rows.groupBy(*keys).agg(covered)
    return rows.agg(covered)


def retention(
    df: DataFrame,
    conds: Sequence[Column | str],
    user_col: str = "user_id",
) -> DataFrame:
    """Per-user retention flags (ClickHouse ``retention``): ``r1`` is
    whether the base condition ever held; ``r_i`` (i>1) is whether BOTH
    the base and condition i held — the classic cohort-retention row,
    one conditional aggregate per condition, single shuffle.

    Returns (user_col, r1 int, r2 int, ..., rN int).
    """
    if not conds:
        raise ValueError("retention needs at least one condition")
    cols = [F.expr(c) if isinstance(c, str) else c for c in conds]
    flags = [
        F.max(F.when(c, F.lit(1)).otherwise(F.lit(0))).alias(f"_f{i}")
        for i, c in enumerate(cols, start=1)
    ]
    agg = df.groupBy(user_col).agg(*flags)
    out = [F.col("_f1").alias("r1")] + [
        (F.col("_f1") * F.col(f"_f{i}")).alias(f"r{i}") for i in range(2, len(cols) + 1)
    ]
    return agg.select(user_col, *out)
