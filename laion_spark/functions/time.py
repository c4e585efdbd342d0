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
