import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
SF_DIR_T2 = os.environ.get("SPARK_GRAFT_T2_SF_DIR", "/root/testdata/sf0.01")

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings".split()
)


@pytest.fixture(scope="session")
def spark():
    from laion_spark.session import get_session

    s = get_session("laion_spark_tests", cpus=min(8, os.cpu_count() or 4))
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """DuckDB connection with the testdata tables registered as views,
    mirroring the driver's oracle setup."""
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def canon(rows, ndigits=6):
    """Canonicalize rows for order-insensitive comparison: floats
    rounded, everything stringified, rows sorted."""
    out = []
    for row in rows:
        vals = []
        for v in row:
            if isinstance(v, float):
                v = round(v, ndigits)
                if v == 0.0:
                    v = 0.0  # normalize -0.0
            s = str(v)
            # DuckDB surfaces DATE as midnight datetime through
            # fetchall; Spark DATE stays datetime.date — normalize both
            # to YYYY-MM-DD (same rule as the driver / driver_mirror)
            vals.append(s[:-9] if s.endswith(" 00:00:00") else s)
        out.append(tuple(vals))
    return sorted(out)


def assert_matches_oracle(spark_df, con, sql, ndigits=6):
    got = canon([tuple(r) for r in spark_df.collect()], ndigits)
    want = canon(con.execute(sql).fetchall(), ndigits)
    assert len(got) == len(want), f"row count {len(got)} != oracle {len(want)}"
    assert got == want
