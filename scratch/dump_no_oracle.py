import os, sys
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
import __spark_entry__ as entry

SF = "/root/testdata/sf0.01"
OUT = "/tmp/oracle_dev"
os.makedirs(OUT, exist_ok=True)
spark = (SparkSession.builder.master("local[8]")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.ui.enabled", "false")
         .config("spark.driver.memory", "8g")
         .getOrCreate())
names = sys.argv[1:] or ["extract_interleaved", "debug_html", "multipage_extract",
                         "dedup_minhash_lsh", "dedup_simhash", "ann_lsh_topk", "ann_ivf_topk",
                         "multimodal_features", "multimodal_resize", "multimodal_frames"]
qs = entry.queries()
for name in names:
    df = qs[name](spark, SF)
    pdf = df.toPandas()
    pdf.to_parquet(f"{OUT}/{name}.parquet")
    print(name, len(pdf))
    print(pdf.head(8).to_string())
