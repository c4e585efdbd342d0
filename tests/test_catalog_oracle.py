"""The local mirror of the driver's t2 gate: every catalog entry with
an oracle runs in Spark AND DuckDB; canonicalized results must match.

Runs at sf0.001 by default (fast); set SPARK_GRAFT_TEST_SF_DIR to
/root/testdata/sf0.01 to mirror the driver exactly.
"""

import pytest

from laion_spark.catalog import REGISTRY
from tests.conftest import SF_DIR, assert_matches_oracle, duck_con

ORACLE_KEYS = [k for k, v in sorted(REGISTRY.items()) if v.oracle]


@pytest.fixture(scope="module")
def con():
    return duck_con(SF_DIR)


@pytest.mark.parametrize("name", ORACLE_KEYS)
def test_oracle_match(spark, con, name):
    spec = REGISTRY[name]
    df = spec.fn(spark, SF_DIR)
    assert_matches_oracle(df, con, spec.oracle)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) == 10
    assert "score" in df.columns
    qs, os_ = e.queries(), e.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) >= 20


def test_window_rotation_stale_first():
    """VERDICT r13 #1: bucket 2 must order by least-recently-driver-
    verified so the 50-entry driver window rotates through the back
    catalog instead of freezing on registry insertion order."""
    import __spark_entry__ as e

    names = [n for n, _ in e._ordered_registry()]
    assert len(names) == len(REGISTRY)
    # sentinels lead, in declared order
    assert names[: len(e._SENTINELS)] == e._SENTINELS
    verified = e._driver_verified()
    tail = [n for n in names[len(e._SENTINELS) :] if n in verified]
    rounds = [verified[n] for n in tail]
    # stale-first: driver-proof rounds are non-decreasing down bucket 2
    assert rounds == sorted(rounds)
    # rotation actually moves: the window after the sentinels must not
    # be dominated by entries the driver just checked last round
    if rounds:
        last_round = max(rounds)
        window_tail = tail[:40]
        recent = sum(1 for n in window_tail if verified[n] == last_round)
        assert recent <= len(window_tail) // 2
