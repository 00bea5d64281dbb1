"""100k-doc curate_resumable soak: realistic c4-passing text with planted
boilerplate + near-dups, killed after the pairs stage, then resumed."""
import sys, time, shutil
sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/jobs")
from pyspark.sql import SparkSession, functions as F
from curate import curate_resumable

OUT = "/tmp/curate_soak_100k"
shutil.rmtree(OUT, ignore_errors=True)
spark = (SparkSession.builder.master("local[32]")
         .config("spark.sql.shuffle.partitions", "32")
         .config("spark.driver.memory", "8g")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

# 90k unique docs: banner line + 25 doc-specific words + terminal period.
# 10k near-dup copies of the first 10k (small tail change).
body = "concat_ws(' ', transform(sequence(1, 25), i -> concat('tok', id, 'x', i)))"
base = spark.range(90_000).select(
    F.col("id").alias("doc_id"),
    F.expr(f"concat('PLEASE SUBSCRIBE TO OUR NEWSLETTER TODAY\\n', {body}, ' ending sentence here.')").alias("text"),
)
dups = spark.range(10_000).select(
    (F.col("id") + 1_000_000).alias("doc_id"),
    F.expr(f"concat('PLEASE SUBSCRIBE TO OUR NEWSLETTER TODAY\\n', {body}, ' ending sentence there.')").alias("text"),
)
docs = base.unionByName(dups)

t0 = time.perf_counter()
try:
    curate_resumable(spark, docs, OUT, min_words=10, minhash_threshold=0.7,
                     line_min_repeats=3, n_buckets=32, fail_after_stage="pairs")
    raise SystemExit("expected injected failure")
except RuntimeError as e:
    assert "injected" in str(e)
t1 = time.perf_counter()
surviving, stats = curate_resumable(spark, docs, OUT, min_words=10,
                                    minhash_threshold=0.7, line_min_repeats=3,
                                    n_buckets=32)
t2 = time.perf_counter()
n = surviving.count()
print(f"phase1(through pairs)={t1-t0:.1f}s resume(final only)={t2-t1:.1f}s")
print(f"resumed_stages={stats['resumed_stages']}")
print(f"input={stats['input_docs']} quality_dropped={stats['quality_dropped']} "
      f"boiler_removed={stats['boilerplate_lines_removed']} pairs={stats['near_dup_pairs']} "
      f"surviving={stats['surviving_docs']} (count check {n})")
# exactness: every unique doc 10k..89999 survives; dup copies lost
lost_unique = 80_000 - surviving.filter((F.col("doc_id") >= 10_000) & (F.col("doc_id") < 90_000)).count()
print(f"unique_docs_lost={lost_unique}")
spark.stop()
