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
