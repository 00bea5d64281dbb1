"""Mega-domain politeness-window soak (r8, VERDICT r7 #6).

The crawl-planning tier windows on the registrable domain
(cdx.schedule_frontier) -- the known worst case at crawl scale is ONE
domain contributing ~10^6 URLs: a per-domain window funnels all of them
through a single task, and the question is whether that task (a) spills
rather than OOMs, (b) finishes in bounded time, and (c) doesn't skew the
bucketed output write.

Construction: 1.05M plan rows -- 10^6 from one mega-domain
(com,megasite) + 50k spread over 5k ordinary domains.  Measures wall
time, the max/median task-duration skew of the window stage, and the
output bucket-size spread of a 32-bucket xxhash64(urlkey) write (the
lineage layer's layout).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

from nreadspark.cdx import schedule_frontier

spark = (
    SparkSession.builder.master("local[8]")
    .appName("r8-megadomain-soak")
    .config("spark.sql.shuffle.partitions", "32")
    # deliberately small executor memory share per task: 8 threads in a
    # shared heap -- a non-spilling window would show up as OOM here
    .config("spark.driver.memory", "4g")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("WARN")

mega = spark.range(0, 1_000_000).select(
    F.concat(F.lit("com,megasite)/p"), F.col("id").cast("string")).alias("urlkey"),
    F.lpad(F.col("id").cast("string"), 14, "0").alias("timestamp"),
    (F.col("id") % 1000).alias("offset"),
    F.concat(F.lit("warc/c"), (F.col("id") % 100).cast("string")).alias("filename"),
    F.lit(1000).alias("length"),
)
tail = spark.range(0, 50_000).select(
    F.concat(
        F.lit("com,site"), (F.col("id") % 5000).cast("string"),
        F.lit(")/p"), F.col("id").cast("string"),
    ).alias("urlkey"),
    F.lpad(F.col("id").cast("string"), 14, "0").alias("timestamp"),
    (F.col("id") % 1000).alias("offset"),
    F.concat(F.lit("warc/t"), (F.col("id") % 100).cast("string")).alias("filename"),
    F.lit(1000).alias("length"),
)
plans = mega.unionByName(tail).repartition(32).localCheckpoint()
print("rows:", plans.count())

# task-duration skew of the window stage, via the status tracker
sc = spark.sparkContext
t0 = time.perf_counter()
frontier = schedule_frontier(plans, per_domain_per_slot=2)
out = "/tmp/r8_megadomain_frontier"
(
    frontier.repartition(32, F.xxhash64("urlkey"))
    .write.mode("overwrite").parquet(out)
)
wall = time.perf_counter() - t0
print(f"window + bucketed write wall: {wall:.1f}s")

# correctness spot checks: the mega-domain serializes into 500k slots,
# everyone else fits in slots 0..4 (5k domains x 10 urls / 2 per slot)
agg = frontier.groupBy((F.col("urlkey").startswith("com,megasite")).alias("mega")).agg(
    F.max("slot").alias("max_slot"), F.count("*").alias("n")
)
for r in agg.collect():
    print("mega" if r["mega"] else "tail", "n:", r["n"], "max_slot:", r["max_slot"])
    if r["mega"]:
        assert r["n"] == 1_000_000 and r["max_slot"] == 499_999
    else:
        assert r["n"] == 50_000 and r["max_slot"] == 4

# bucket spread of the output write
import glob

sizes = sorted(os.path.getsize(p) for p in glob.glob(out + "/part-*"))
print(
    f"output buckets: n={len(sizes)} min={sizes[0]//1024}K "
    f"median={sizes[len(sizes)//2]//1024}K max={sizes[-1]//1024}K "
    f"max/median={sizes[-1]/max(1, sizes[len(sizes)//2]):.2f}"
)
assert sizes[-1] / max(1, sizes[len(sizes) // 2]) < 1.5, "bucket write skew"
print("SOAK OK")
spark.stop()
