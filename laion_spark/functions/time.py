"""Event-time normalization helpers.

The ``events`` table's ``ts`` column has shipped in two physical forms:

* ``TIMESTAMP(MICROS)`` parquet — Spark reads TIMESTAMP / TIMESTAMP_NTZ
  (the current testdata shape);
* ``TIMESTAMP(NANOS)`` parquet — Spark has no nanos type, so with
  ``spark.sql.legacy.parquet.nanosAsLong=true`` it surfaces as raw
  ``bigint`` nanoseconds.

Everything downstream (funnels, sessionization, as-of joins, gap fill,
EMA...) wants a single canonical representation: **epoch microseconds**
(``bigint``), which is exactly DuckDB's ``epoch_us(ts)`` so oracles line
up. These helpers branch on the *observed* dtype rather than assuming a
storage layout — the round-3 lesson: a hardcoded ``ts div 1000`` broke
21 components when the data regenerated as micros.

With the session timezone pinned to UTC (session.py), casting
TIMESTAMP_NTZ -> TIMESTAMP is a no-op reinterpretation, so
``unix_micros`` matches DuckDB's UTC-naive reading of the same parquet.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

ColumnOrName = Column | str


def ts_us_col(df: DataFrame, col: str = "ts") -> Column:
    """Column of epoch-microseconds for ``col``, whatever its physical type."""
    dt = dict(df.dtypes).get(col)
    if dt == "bigint":  # legacy nanos-as-long storage
        return F.expr(f"{col} div 1000")
    # timestamp / timestamp_ntz (micros), or a castable string
    return F.unix_micros(F.col(col).cast("timestamp"))


def with_event_time(df: DataFrame, col: str = "ts") -> DataFrame:
    """Add canonical ``ts_us`` (bigint epoch micros) and ``ts_t``
    (TIMESTAMP) columns derived from ``col``."""
    us = ts_us_col(df, col)
    return df.withColumn("ts_us", us).withColumn("ts_t", F.timestamp_micros(us))


def time_slot_sequence(
    ts_us: ColumnOrName, dur_us: ColumnOrName, width_us: int = 1_800_000_000
):
    """ClickHouse ``timeSlots(start, duration)`` analog (catalog e32):
    the array of ``width_us``-grid slot starts an interval
    [ts, ts+duration] touches, in exact epoch-microsecond integers —
    explode it to count interval activity per slot. Expansion is
    bounded by duration/width, so the explode is O(rows).

    Floor-to-grid uses ``pmod``, not ``%``: Spark's ``%`` takes the
    dividend's sign, so a plain ``t0 - t0 % w`` on a pre-1970
    (negative) timestamp would round toward zero and miss the
    interval's first slot. ``pmod`` is a true floor for any sign."""
    t0 = F.col(ts_us) if isinstance(ts_us, str) else ts_us
    d = F.col(dur_us) if isinstance(dur_us, str) else dur_us
    lo = t0 - F.pmod(t0, F.lit(width_us))
    hi = (t0 + d) - F.pmod(t0 + d, F.lit(width_us))
    return F.sequence(lo, hi, F.lit(width_us).cast("long"))
