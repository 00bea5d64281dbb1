"""Approximate-nearest-neighbor search over an embedding column.

* ``brute_force_topk``: exact cosine top-k -- query set broadcast against the
  corpus, dot products via JVM ``zip_with``/``aggregate`` (whole-stage
  codegen; no Python).  Fine for verification and for small query sets.
* ``lsh_topk``: random-hyperplane LSH -- sign-bit signatures bucket the
  corpus; only same-bucket (or near-bucket) pairs are scored.  This is the
  100TB path: the shuffle is on short bucket keys, candidate scoring touches
  a tiny corpus fraction, and recall is tunable by bands/bits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _as_double_vec(col):
    return F.transform(col, lambda x: x.cast("double"))


def _cosine(vec_a, vec_b):
    dot = F.aggregate(
        F.zip_with(vec_a, vec_b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    na = F.sqrt(F.aggregate(vec_a, F.lit(0.0), lambda acc, x: acc + x * x))
    nb = F.sqrt(F.aggregate(vec_b, F.lit(0.0), lambda acc, x: acc + x * x))
    return dot / (na * nb)


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine; deterministic tie-break (cosine desc, id asc).
    The query side is broadcast: no shuffle of the corpus."""
    c = corpus.select(
        F.col(id_col).alias("corpus_id"), _as_double_vec(F.col(vec_col)).alias("corpus_vec")
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double_vec(F.col(vec_col)).alias("query_vec")
    )
    joined = c.crossJoin(F.broadcast(q)).filter(F.col("corpus_id") != F.col("query_id"))
    scored = joined.select(
        "query_id",
        "corpus_id",
        F.round(_cosine(F.col("query_vec"), F.col("corpus_vec")), 6).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("corpus_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "corpus_id", "cosine", F.col("rank").cast("bigint").alias("rank"))
    )


def _hyperplanes(dim: int, n_bits: int, seed: int = 7):
    """Deterministic pseudo-random hyperplanes (LCG; no numpy needed on the
    driver, broadcast as literals)."""
    state = seed * 6364136223846793005 + 1442695040888963407
    planes = []
    for _ in range(n_bits):
        row = []
        for _ in range(dim):
            state = (state * 6364136223846793005 + 1442695040888963407) & ((1 << 63) - 1)
            row.append(((state >> 20) % 2001 - 1000) / 1000.0)  # [-1, 1]
        planes.append(row)
    return planes


def lsh_signatures(
    df: DataFrame,
    dim: int,
    n_bits: int = 16,
    n_bands: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Random-hyperplane sign bits grouped into OR-amplified bands: one
    output row per (vector, band) with a short string bucket key.  A pair is
    a candidate if ANY band key collides -- the standard recall amplifier."""
    planes = _hyperplanes(dim, n_bits)
    vec = _as_double_vec(F.col(vec_col))
    bits = []
    for plane in planes:
        plane_arr = F.array(*[F.lit(v) for v in plane])
        dot = F.aggregate(
            F.zip_with(vec, plane_arr, lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x
        )
        bits.append(F.when(dot >= 0, F.lit("1")).otherwise(F.lit("0")))
    rows_per_band = n_bits // n_bands
    band_keys = F.array(
        *[
            F.concat(
                F.lit(f"{b}:"), *bits[b * rows_per_band : (b + 1) * rows_per_band]
            )
            for b in range(n_bands)
        ]
    )
    return df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        F.explode(band_keys).alias("bucket"),
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_bits: int = 16,
    n_bands: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Banded ANN: score only candidates sharing at least one band bucket.
    Recall < 1 by design (tunable via n_bands/n_bits); tests measure it
    against brute_force_topk."""
    c = lsh_signatures(corpus, dim, n_bits, n_bands, id_col, vec_col).select(
        F.col("id").alias("corpus_id"),
        _as_double_vec(F.col("vec")).alias("corpus_vec"),
        "bucket",
    )
    q = lsh_signatures(queries, dim, n_bits, n_bands, id_col, vec_col).select(
        F.col("id").alias("query_id"),
        _as_double_vec(F.col("vec")).alias("query_vec"),
        "bucket",
    )
    joined = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("corpus_id") != F.col("query_id"))
        .select("query_id", "corpus_id", "query_vec", "corpus_vec")
        .dropDuplicates(["query_id", "corpus_id"])
    )
    scored = joined.select(
        "query_id",
        "corpus_id",
        F.round(_cosine(F.col("query_vec"), F.col("corpus_vec")), 6).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("corpus_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "corpus_id", "cosine", F.col("rank").cast("bigint").alias("rank"))
    )
