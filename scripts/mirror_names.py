"""Driver-canon mirror for a NAMED subset of registry entries.

Like driver_mirror.py but takes entry names instead of a window slice —
the tool for the touched-entry three-scale ritual:

    python scripts/mirror_names.py sf_dir name [name ...]
"""

from __future__ import annotations

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from driver_mirror import canon_df  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1]
    names = sys.argv[2:]

    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as E

    spark = SparkSession.builder.master("local[16]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs, osql = E.queries(), E.oracle_sql()
    n_pass = n_rows_only = n_fail = 0
    for name in names:
        try:
            got = canon_df(qs[name](spark, sf_dir).toPandas())
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
