"""Local mirror of the verification driver's CORRECTNESS pass.

Runs the FIRST N entries of the rotated registry (exactly the window
the driver will sample) at sf0.01, canonicalizing results the way the
driver does (pandas frame, columns sorted by name, floats rounded,
rows sorted) — so array-typed cells crash HERE, not in the round
artifact. Usage:

    python scripts/driver_mirror.py [N] [sf_dir]
"""

from __future__ import annotations

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def canon_df(pdf):
    import pandas as pd  # noqa: F401

    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    for c in pdf.columns:
        if pdf[c].dtype == "float64" or pdf[c].dtype == "float32":
            pdf[c] = pdf[c].round(6)
    pdf = pdf.sort_values(by=list(pdf.columns)).reset_index(drop=True)

    def s(v):
        # DuckDB DATE surfaces as midnight datetime64 through .df();
        # Spark DATE stays datetime.date — normalize both to YYYY-MM-DD
        out = str(v)
        return out[:-9] if out.endswith(" 00:00:00") else out

    return [tuple(s(v) for v in row) for row in pdf.itertuples(index=False)]


def main() -> None:
    spec = sys.argv[1] if len(sys.argv) > 1 else "55"
    lo, hi = (int(x) for x in spec.split(":")) if ":" in spec else (0, int(spec))
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as E

    spark = SparkSession.builder.master("local[16]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs, osql = E.queries(), E.oracle_sql()
    names = list(qs)[lo:hi]
    n_pass = n_rows_only = n_fail = 0
    for name in names:
        try:
            df = qs[name](spark, sf_dir)
            pdf = df.toPandas()
            got = canon_df(pdf)
            if name not in osql:
                print(f"ROWS_ONLY {name} ({len(got)} rows)")
                n_rows_only += 1
                continue
            want = canon_df(con.execute(osql[name]).df())
            if got == want:
                print(f"MATCH     {name} ({len(got)} rows)")
                n_pass += 1
            else:
                print(f"MISMATCH  {name}: spark={len(got)} oracle={len(want)}")
                for g, w in list(zip(got, want))[:3]:
                    if g != w:
                        print(f"   spark={g}\n   duck ={w}")
                n_fail += 1
        except Exception:
            print(f"ERROR     {name}")
            traceback.print_exc(limit=3)
            n_fail += 1
    print(f"\n{n_pass} match, {n_rows_only} rows-only, {n_fail} fail of {len(names)}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
