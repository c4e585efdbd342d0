"""Fuzzy string similarity — the entity-resolution scoring family
(catalog q146). Unlike :mod:`laion_spark.functions.text` (pure
Catalyst), the scorers here are Arrow-batched pandas UDFs: Jaro /
Jaro-Winkler need per-character match bookkeeping that no Catalyst
built-in expresses, so this is the documented slow path — and the
operator contract confines it to BLOCKED candidate pairs (equi-join on
a blocking key + length band), never a corpus-scale column scan.

Cross-engine contract: ``jaro_winkler_similarity`` implements the
classic Winkler variant (match window ``max(|a|,|b|)//2 - 1``, half
transpositions, prefix bonus ``l<=4`` at ``p=0.1`` applied only when
jaro > 0.7) and is pinned bit-identical to DuckDB's
``jaro_winkler_similarity`` by tests/test_fuzzy.py (exhaustive over the
testdata vocabularies + randomized cross-checks), so catalog oracles
can threshold and floor-to-micros on either engine without quotient
ties.

100 TB shape: candidate generation is the scalable part and it stays
declarative — block on cheap deterministic keys (first character here;
soundex / q-gram buckets in production), band on length, broadcast the
smaller dictionary side. The Python scorer then touches only the
surviving candidates (vocabulary-sized, not corpus-sized), one Arrow
batch at a time.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, functions as F
from pyspark.sql.pandas.functions import pandas_udf
from pyspark.sql.types import DoubleType


def _jaro(s1: str, s2: str) -> float:
    # empty-before-equal: two empty strings score 0.0 (the DuckDB /
    # rapidfuzz convention), not 1.0
    if not s1 or not s2:
        return 0.0
    if s1 == s2:
        return 1.0
    l1, l2 = len(s1), len(s2)
    window = max(l1, l2) // 2 - 1
    if window < 0:
        window = 0
    m1 = [False] * l1
    m2 = [False] * l2
    matches = 0
    for i, c in enumerate(s1):
        lo = i - window if i > window else 0
        hi = min(l2, i + window + 1)
        for j in range(lo, hi):
            if not m2[j] and s2[j] == c:
                m1[i] = m2[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    # transpositions: matched chars of s1 vs s2 in match order
    t = 0
    k = 0
    for i in range(l1):
        if m1[i]:
            while not m2[k]:
                k += 1
            if s1[i] != s2[k]:
                t += 1
            k += 1
    t //= 2
    return (matches / l1 + matches / l2 + (matches - t) / matches) / 3.0


def _jaro_winkler(s1: str, s2: str, p: float = 0.1, threshold: float = 0.7) -> float:
    j = _jaro(s1, s2)
    if j > threshold:
        l = 0
        for a, b in zip(s1[:4], s2[:4]):
            if a != b:
                break
            l += 1
        j += l * p * (1.0 - j)
    return j


# an explicit DataType instance, not the DDL string "double": the
# string form re-parses through the active session when the UDF is
# unpickled on an executor, where no session exists
@pandas_udf(DoubleType())
def _jw_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    return pd.Series(
        [
            None if x is None or y is None else _jaro_winkler(x, y)
            for x, y in zip(a, b)
        ],
        dtype="float64",
    )


def jaro_winkler_similarity(a: Column | str, b: Column | str) -> Column:
    """Jaro-Winkler similarity in [0, 1] as a double Column (Arrow
    pandas UDF — see the module docstring for when this is allowed in
    a plan). NULL in, NULL out."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    return _jw_udf(ca, cb)
