"""100k-doc end-to-end near-dup chain soak: 80k unique + 20k planted
near-dups at Jaccard ~0.92; measures wall time, false removals, LSH recall."""
import sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession, functions as F
from nreadspark.ops.dedup import (
    keep_canonical, minhash_lsh_candidates, release_caches, verify_jaccard,
)

spark = (SparkSession.builder.master("local[32]")
         .config("spark.sql.shuffle.partitions", "32")
         .config("spark.driver.memory", "8g")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

# 80k unique docs (doc-specific vocab) + 20k near-dup copies of the first
# 20k (12 of 13 words shared -> shingle Jaccard ~0.92)
base = spark.range(80_000).select(
    F.col("id").alias("doc_id"),
    F.expr("concat_ws(' ', transform(sequence(1, 13), i -> concat('u', id, 'w', i)))").alias("text"),
)
dups = spark.range(20_000).select(
    (F.col("id") + 1_000_000).alias("doc_id"),
    F.expr("concat_ws(' ', transform(sequence(1, 12), i -> concat('u', id, 'w', i)), 'tail')").alias("text"),
)
docs = base.unionByName(dups).persist()
n = docs.count()

t0 = time.perf_counter()
cand = minhash_lsh_candidates(docs)
verified = verify_jaccard(docs, cand, threshold=0.7).select("doc_id_a", "doc_id_b").persist()
n_pairs = verified.count()
t1 = time.perf_counter()
surviving = keep_canonical(docs, verified).persist()
n_surv = surviving.count()
t2 = time.perf_counter()

# planted pair (i, i+1_000_000); recall = fraction verified
planted_found = verified.filter(
    (F.col("doc_id_b") - F.col("doc_id_a") == 1_000_000)
    & (F.col("doc_id_a") < 20_000)
).count()
# false removals: unique docs (20000..79999) must all survive
uniq_lost = 80_000 - 20_000 - surviving.filter(
    (F.col("doc_id") >= 20_000) & (F.col("doc_id") < 80_000)
).count()
print(f"docs={n} pairs={n_pairs} surviving={n_surv}")
print(f"candidates+verify={t1-t0:.1f}s components+antijoin={t2-t1:.1f}s total={t2-t0:.1f}s ({n/(t2-t0):.0f} docs/s)")
print(f"planted_recall={planted_found/20_000:.3f} unique_docs_lost={uniq_lost}")
release_caches()
spark.stop()
