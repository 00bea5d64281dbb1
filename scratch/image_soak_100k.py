"""100k-image soak for the perceptual-hash tier: hash throughput on small
(16x16) and mid-size (64x64) PNGs, pair-join wall on the banded near-dup,
and planted-cluster exactness (doc_id % 997 collisions -> identical
hashes -> every same-base pair must surface at hamming 0).

Run: python scratch/image_soak_100k.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession, functions as F

from nreadspark.ops.images import image_hashes, near_dup_image_pairs, synthesize_png_corpus

N = 100_000
N_BASES = 997  # ~100 docs per base -> ~100k C(100,2)-ish exact-dup pairs? no:
# 997 bases x C(100,2) = 997 * 4950 ~ 4.9M pairs -- too many to count cheaply.
# Use a sparser plant for the pair stage: the pair soak runs on a 10k slice
# (10 docs/base -> 997 * C(10,2) = 44 865 expected hamming-0 pairs).


def main():
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.range(N).withColumnRenamed("id", "doc_id")
    docs.count()  # warm

    for size in (16, 64):
        media = synthesize_png_corpus(docs, size=size, n_bases=N_BASES)
        walls = []
        for _ in range(2):
            t0 = time.monotonic()
            n_ok = (
                image_hashes(media, max_decode_pixels=1 << 16)
                .filter(F.col("decoder") == "pixels:png")
                .count()
            )
            walls.append(time.monotonic() - t0)
        wall = min(walls)
        print(
            f"hash {size}x{size}: {N} imgs in {wall:6.2f}s "
            f"= {N / wall:8.0f} imgs/s  (decodable {n_ok})"
        )

    # pair stage on a 10k slice: 997 bases x ~10 docs -> every same-base
    # pair must appear at hamming 0 (corrupt rows excluded from both sides)
    slice_docs = docs.filter(F.col("doc_id") < 10_000)
    hdf = image_hashes(synthesize_png_corpus(slice_docs, n_bases=N_BASES))
    ok_refs = hdf.filter(F.col("decoder") == "pixels:png")
    base_sizes = (
        ok_refs.withColumn(
            "base",
            F.pmod(F.split_part(F.col("media_ref"), F.lit("://"), F.lit(2)).cast("long"), F.lit(N_BASES)),
        )
        .groupBy("base")
        .count()
        .collect()
    )
    # distinct bases may share identical hashes only if the pixel formula
    # collides across bases; count expected SAME-BASE pairs as a lower bound
    expected_min = sum(r["count"] * (r["count"] - 1) // 2 for r in base_sizes)
    t0 = time.monotonic()
    pairs = near_dup_image_pairs(hdf, max_hamming=3)
    n_pairs = pairs.count()
    n_zero = pairs.filter(F.col("hamming") == 0).count()
    wall = time.monotonic() - t0
    print(
        f"pairs on 10k: {n_pairs} pairs ({n_zero} at hamming 0, "
        f">= {expected_min} same-base expected) in {wall:6.2f}s"
    )
    assert n_zero >= expected_min, (n_zero, expected_min)
    print("planted-cluster exactness OK")
    spark.stop()


if __name__ == "__main__":
    main()
