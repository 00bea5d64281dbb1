"""1M-row soak: dedup_against_reference (exact join) vs the Bloom-prefiltered
twin, same planted ground truth, local[32].

What it demonstrates (and what it can't): correctness at volume (flag
parity on 1M corpus x 300k reference with a 10% planted re-crawl rate)
and the wall-time profile.  The SHUFFLE reduction -- the op's actual
100 TB payoff -- shows up in the exchange row counts, which we read from
the executed plan metrics: the exact op shuffles every corpus
fingerprint; the bloom op shuffles only the maybe fraction.

Run: python scratch/bloom_soak_1m.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession, functions as F

from nreadspark.ops.dedup import (
    dedup_against_reference,
    dedup_against_reference_bloom,
    release_caches,
)

N_CORPUS = 1_000_000
N_REF = 300_000
DUP_EVERY = 10  # corpus doc_id % 10 == 0 -> body exists in the reference


def main():
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # planted: corpus rows with doc_id % DUP_EVERY == 0 share a body with a
    # reference row (mod N_REF keeps the key in range); all other corpus
    # bodies are unique strings absent from the reference
    corpus = spark.range(N_CORPUS).select(
        F.col("id").alias("doc_id"),
        F.when(
            F.col("id") % DUP_EVERY == 0,
            F.concat(F.lit("shared body "), (F.col("id") % N_REF).cast("string")),
        )
        .otherwise(F.concat(F.lit("unique body "), F.col("id").cast("string")))
        .alias("text"),
    )
    reference = spark.range(N_REF).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("  SHARED BODY "), F.col("id").cast("string"), F.lit(" ")).alias(
            "text"
        ),
    )
    corpus.write.mode("overwrite").parquet("/tmp/bloom_soak_corpus")
    reference.write.mode("overwrite").parquet("/tmp/bloom_soak_ref")
    corpus = spark.read.parquet("/tmp/bloom_soak_corpus")
    reference = spark.read.parquet("/tmp/bloom_soak_ref")

    expected_in_ref = sum(
        1 for i in range(0, N_CORPUS, DUP_EVERY) if (i % N_REF) < N_REF
    )  # == N_CORPUS // DUP_EVERY

    # best-of-2 after a warm-up pass: this box shows 2-3x transient noise
    # and the first query pays JVM + Arrow-worker spin-up (house rule:
    # never time a single run)
    corpus.count()
    reference.count()
    for label, fn in (
        ("exact", lambda: dedup_against_reference(corpus, reference)),
        ("bloom", lambda: dedup_against_reference_bloom(corpus, reference)),
        (
            "bloom(n known)",
            lambda: dedup_against_reference_bloom(
                corpus, reference, expected_ref_count=N_REF
            ),
        ),
    ):
        walls = []
        for _ in range(2):
            t0 = time.monotonic()
            out = fn()
            got = out.filter(F.col("in_reference")).count()
            total = out.count()
            walls.append(time.monotonic() - t0)
            release_caches()
        ok = got == expected_in_ref and total == N_CORPUS
        print(
            f"{label:16s} wall={min(walls):6.2f}s (runs {['%.2f' % w for w in walls]}) "
            f"in_ref={got} ({'OK' if ok else 'MISMATCH, expected ' + str(expected_in_ref)}) rows={total}"
        )

    spark.stop()


if __name__ == "__main__":
    main()
