"""Deterministic key-coherent sampling — the ClickHouse ``SAMPLE``
clause re-expressed as a Catalyst filter.

Reference semantics (ClickHouse ``SELECT ... SAMPLE 1/10``): the table
declares ``SAMPLE BY intHash32(key)``; a ``SAMPLE k`` query keeps rows
whose hashed key falls below ``k * UINT32_MAX``. Two properties make
this more than a random subset and are preserved here:

* **deterministic** — the same query re-run (or run on another replica
  / engine) selects the same rows, so sampled results are reproducible
  and joinable across queries;
* **key-coherent** — every row sharing a sampling key is kept or
  dropped together, so per-key aggregates (sessions per user, events
  per user) computed on the sample are complete for the sampled keys —
  the estimator is "scale key-grain counts by 1/fraction", not a
  row-Bernoulli correction.

Spark realization: a plain ``filter`` on a hash expression — fully
JVM-side, whole-stage-codegen'd, applied at the scan before any
shuffle, so a ``SAMPLE 1/10`` aggregation moves ~1/10 of the data at
100 TB exactly like the reference.

Two hash backends:

* ``method="portable"`` — Knuth multiplicative hash
  ``pmod(key * 2654435761, 2^32)``: identical integer arithmetic in
  every SQL engine (for non-negative keys ``pmod`` equals plain ``%``,
  so a DuckDB oracle can replay the exact row set). Contract: the key
  must fit in ``(-2^31, 2^31)`` so the product fits int64 — beyond
  that the multiply overflows (an ANSI-mode error, not silence). Hash
  down wider keys first.
* ``method="xxhash"`` — ``xxhash64(seed, key) & INT64_MAX`` compared
  against ``fraction * 2^63``: the production path for arbitrary-width
  / composite / string keys (Spark-only; no cross-engine contract).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: Knuth's multiplicative constant (2^32 / golden ratio, odd).
_KNUTH = 2654435761
_M32 = 1 << 32
_M63 = (1 << 63) - 1


def portable_hash32(key: Column | str) -> Column:
    """``pmod(key * 2654435761, 2^32)`` as a BIGINT in [0, 2^32) —
    reproducible in any engine with 64-bit integer arithmetic for keys
    in (-2^31, 2^31) (the product then fits int64). The POSITIVE
    modulus matters: SQL ``%`` follows the dividend's sign, so a plain
    ``%`` would map every negative key below any threshold and a
    sample of signed keys would silently keep 100% of the negatives."""
    c = F.col(key) if isinstance(key, str) else key
    return F.pmod(c.cast("bigint") * F.lit(_KNUTH), F.lit(_M32))


def sample_by(
    df: DataFrame,
    key: Column | str,
    fraction: float,
    *,
    method: str = "portable",
    seed: int = 0,
) -> DataFrame:
    """Keep rows whose hashed sampling ``key`` falls in the lowest
    ``fraction`` of hash space (ClickHouse ``SAMPLE fraction``).

    Unlike ``DataFrame.sample`` (per-row Bernoulli, nondeterministic
    across reruns/partitionings), this is a pure deterministic filter:
    stable row set, coherent per key, pushdown-friendly.
    """
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    if method not in ("portable", "xxhash"):
        raise ValueError(f"unknown sample method {method!r}")
    if fraction == 1.0:
        return df  # keep-everything: no filter (2^63 also overflows lit)
    if method == "portable":
        thresh = int(fraction * _M32)
        return df.filter(portable_hash32(key) < F.lit(thresh))
    c = F.col(key) if isinstance(key, str) else key
    thresh = int(fraction * (_M63 + 1))
    h = F.xxhash64(F.lit(seed), c).bitwiseAND(F.lit(_M63))
    return df.filter(h < F.lit(thresh))
