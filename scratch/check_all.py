"""Local simulation of the driver's correctness gate at a given SF dir."""
import sys, importlib.util, traceback
import duckdb
from pyspark.sql import SparkSession

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
spec = importlib.util.spec_from_file_location("se", "/root/repo/__spark_entry__.py")
se = importlib.util.module_from_spec(spec); spec.loader.exec_module(se)
spark = (SparkSession.builder.master("local[16]")
         .config("spark.sql.shuffle.partitions", "16")
         .config("spark.ui.enabled", "false").getOrCreate())
con = duckdb.connect()
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
qs, os_ = se.queries(), se.oracle_sql()
fails, no_oracle = [], []
for name, fn in qs.items():
    try:
        sdf = fn(spark, sf).toPandas()
    except Exception as e:
        print(f"{name:28s} SPARK-ERROR {type(e).__name__}: {e}"[:160]); fails.append(name); continue
    if name not in os_:
        print(f"{name:28s} rows-only   spark_rows={len(sdf)}"); no_oracle.append(name); continue
    try:
        odf = con.execute(os_[name]).fetchdf()
    except Exception as e:
        print(f"{name:28s} ORACLE-ERROR {e}"[:160]); fails.append(name); continue
    cols = sorted(sdf.columns)
    ocols = sorted(odf.columns)
    if cols != ocols:
        print(f"{name:28s} SCHEMA-MISMATCH {cols} vs {ocols}"); fails.append(name); continue
    a = sdf[cols].sort_values(cols).reset_index(drop=True).astype(str)
    b = odf[cols].sort_values(cols).reset_index(drop=True).astype(str)
    ok = len(a) == len(b) and a.equals(b)
    print(f"{name:28s} {'OK' if ok else 'VALUE-MISMATCH'} rows={len(a)}/{len(b)}")
    if not ok: fails.append(name)
print("\nFAILS:", fails)
print("NO_ORACLE:", no_oracle)
spark.stop()
