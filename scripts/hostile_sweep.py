"""Hostile-session sweep: replay the driver's canon over a registry
slice under a PRESET non-UTC timezone and 200 shuffle partitions —
config robustness the plain driver session never exercises.

    python scripts/hostile_sweep.py LO HI
"""
import sys
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")
import duckdb
from pyspark.sql import SparkSession
import __spark_entry__ as E
from driver_mirror import canon_df

lo, hi = int(sys.argv[1]), int(sys.argv[2])
spark = (SparkSession.builder.master("local[16]")
         .config("spark.sql.session.timeZone", "America/New_York")
         .config("spark.sql.shuffle.partitions", "200")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
con = duckdb.connect()
sf = "/root/testdata/sf0.01"
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
qs, osql = E.queries(), E.oracle_sql()
names = list(qs)[lo:hi]
n_pass = n_ro = n_fail = 0
for name in names:
    try:
        got = canon_df(qs[name](spark, sf).toPandas())
        if name not in osql:
            n_ro += 1
            print(f"ROWS_ONLY {name}")
            continue
        want = canon_df(con.execute(osql[name]).df())
        if got == want:
            n_pass += 1
            print(f"MATCH     {name}")
        else:
            n_fail += 1
            print(f"MISMATCH  {name}")
    except Exception as ex:
        n_fail += 1
        print(f"ERROR     {name}: {type(ex).__name__}: {str(ex)[:200]}")
print(f"\n{n_pass} match, {n_ro} rows-only, {n_fail} fail of {len(names)}")
