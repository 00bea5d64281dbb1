"""Spot-check queries() vs oracle_sql() at sf0.01 (the driver's gate scale).
Usage: python scratch/check_oracles.py [query ...]  (default: all oracles)"""
import os, sys, math
sys.path.insert(0, "/root/repo")
import duckdb
from pyspark.sql import SparkSession
import __spark_entry__ as entry

SF = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
spark = (SparkSession.builder.master("local[8]")
         .config("spark.sql.shuffle.partitions","8")
         .config("spark.ui.enabled","false").getOrCreate())
con = duckdb.connect()
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

def norm(v):
    if isinstance(v, float):
        return "nan" if math.isnan(v) else f"{v:.6f}"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)

qs, osql = entry.queries(), entry.oracle_sql()
names = sys.argv[1:] or sorted(osql)
fails = 0
for name in names:
    sdf = qs[name](spark, SF)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    res = con.execute(osql[name]); dcols=[d[0] for d in res.description]; drows=res.fetchall()
    order_s = sorted(range(len(scols)), key=lambda i: scols[i])
    order_d = sorted(range(len(dcols)), key=lambda i: dcols[i])
    cs = sorted(tuple(norm(r[i]) for i in order_s) for r in srows)
    cd = sorted(tuple(norm(r[i]) for i in order_d) for r in drows)
    ok = sorted(scols)==sorted(dcols) and len(srows)==len(drows) and cs==cd
    print(name, "cols", sorted(scols)==sorted(dcols), "rows", f"{len(srows)}/{len(drows)}", "values", cs==cd)
    if not ok:
        fails += 1
        diffs = [(a,b) for a,b in zip(cs,cd) if a!=b][:3]
        print("  first diffs:", diffs)
sys.exit(1 if fails else 0)
