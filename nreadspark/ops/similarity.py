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

from dataclasses import dataclass

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
    planes: str = "random",
) -> DataFrame:
    """Random-hyperplane sign bits grouped into OR-amplified bands: one
    output row per (vector, band) with a short string bucket key.  A pair is
    a candidate if ANY band key collides -- the standard recall amplifier.

    All n_bits dot products happen in ONE Arrow-batched float64 GEMM
    (vectors x planes^T) instead of n_bits codegen'd ``aggregate`` passes
    over the array column -- the expression-tree form compiled to a
    multi-second whole-stage-codegen unit and rescanned the vector per bit.

    ``planes``: 'random' (default, LCG-seeded hyperplanes) or 'axis' --
    bit j is the sign of coordinate j.  Axis planes are a degenerate but
    valid member of the same LSH family whose buckets involve NO float
    arithmetic, so an external SQL engine can replicate the exact candidate
    sets for correctness oracles.

    Null or wrong-length vectors are dropped (they can neither hash nor
    score); a production pipeline should count them upstream."""
    import pyarrow as pa
    from pyspark.sql.types import (
        ArrayType,
        DoubleType,
        StringType,
        StructField,
        StructType,
    )

    plane_rows = None if planes == "axis" else _hyperplanes(dim, n_bits)
    rows_per_band = n_bits // n_bands
    bc = df.sparkSession.sparkContext.broadcast(plane_rows)

    out_schema = StructType(
        [
            StructField("id", StringType()),
            StructField("vec", ArrayType(DoubleType())),
            StructField("bucket", StringType()),
        ]
    )

    def batches(iterator):
        import numpy as np

        P = None if bc.value is None else np.asarray(bc.value, dtype=np.float64)
        for batch in iterator:
            ids = batch.column(0).to_pylist()
            vecs = batch.column(1).to_pylist()
            keep = [
                i
                for i in range(len(ids))
                if vecs[i] is not None
                and len(vecs[i]) == dim
                and not any(v is None for v in vecs[i])
            ]
            if not keep:
                continue
            ids = [ids[i] for i in keep]
            vecs = [vecs[i] for i in keep]
            X = np.asarray(vecs, dtype=np.float64)
            if P is None:
                bits = X[:, :n_bits] >= 0  # axis planes: pure sign reads
            else:
                bits = (X @ P.T) >= 0  # (n, n_bits) sign bits
            out_ids, out_vecs, out_buckets = [], [], []
            for i in range(len(ids)):
                row = bits[i]
                for b in range(n_bands):
                    key = "".join(
                        "1" if row[j] else "0"
                        for j in range(b * rows_per_band, (b + 1) * rows_per_band)
                    )
                    out_ids.append(ids[i])
                    out_vecs.append(vecs[i])
                    out_buckets.append(f"{b}:{key}")
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(out_ids, pa.string()),
                    pa.array(out_vecs, pa.list_(pa.float64())),
                    pa.array(out_buckets, pa.string()),
                ],
                names=["id", "vec", "bucket"],
            )

    prepared = df.select(
        F.col(id_col).cast("string").alias("id"),
        F.col(vec_col).cast("array<double>").alias("vec"),
    )
    return prepared.mapInArrow(batches, out_schema)


def _train_ivf_centroids(corpus, n_lists, sample_size, id_col, vec_col, iters=8):
    """Deterministic spherical k-means on a hash-ordered sample (driver-side
    numpy; the sample is tiny).  Farthest-point init from the first sample
    vector, fixed iteration count -- fully reproducible, no RNG."""
    import numpy as np
    from pyspark.sql import functions as F

    # Arrow-path collect (r9): .collect() ships 2048x64 doubles through
    # the py4j pickle socket (~0.2 s of pure serialization); toPandas
    # rides the session's Arrow transfer instead
    sample = (
        corpus.select(
            F.col(vec_col).cast("array<double>").alias("v"),
            F.xxhash64(F.col(id_col).cast("string")).alias("h"),
        )
        .where(F.col("v").isNotNull())
        .orderBy("h")
        .limit(sample_size)
        .toPandas()["v"]
        .tolist()
    )
    # guard against ragged/corrupt vectors: train on the MODAL dimension
    # (max() would let a single over-long garbage vector discard every
    # valid one and empty the downstream results)
    from collections import Counter

    dim_counts = Counter(len(v) for v in sample)
    modal_dim = dim_counts.most_common(1)[0][0] if dim_counts else 0
    vecs = [v for v in sample if len(v) == modal_dim and modal_dim > 0]
    if not vecs:
        raise ValueError(
            "IVF centroid training needs a non-empty corpus sample with "
            "non-null embedding vectors"
        )
    X = np.asarray(vecs, dtype=np.float64)
    X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)

    # farthest-point (maximin) init
    cents = [X[0]]
    for _ in range(min(n_lists, len(X)) - 1):
        sims = np.max(np.stack([X @ c for c in cents]), axis=0)
        cents.append(X[int(np.argmin(sims))])
    C = np.stack(cents)

    for _ in range(iters):
        assign = np.argmax(X @ C.T, axis=1)
        for j in range(len(C)):
            members = X[assign == j]
            if len(members):
                m = members.mean(axis=0)
                n = np.linalg.norm(m)
                if n > 1e-12:
                    C[j] = m / n
    return C


def _ivf_assign_schema():
    from pyspark.sql.types import (
        ArrayType,
        DoubleType,
        IntegerType,
        StringType,
        StructField,
        StructType,
    )

    return StructType(
        [
            StructField("id", StringType()),
            StructField("vec", ArrayType(DoubleType())),
            StructField("list_id", IntegerType()),
        ]
    )


def _ivf_assign_fn(bc, top_n: int):
    """Arrow-batched list assignment: each vector -> its top_n nearest
    centroids (1 for corpus rows, n_probe for queries), ONE GEMM per batch."""

    def fn(iterator):
        import numpy as np
        import pyarrow as pa

        cents = np.asarray(bc.value, dtype=np.float64)
        dim = cents.shape[1]
        for batch in iterator:
            ids = batch.column(0).to_pylist()
            vecs = batch.column(1).to_pylist()
            # drop null/ragged vectors instead of failing the stage
            keep = [
                i
                for i in range(len(ids))
                if vecs[i] is not None
                and len(vecs[i]) == dim
                and not any(v is None for v in vecs[i])
            ]
            if not keep:
                continue
            ids = [ids[i] for i in keep]
            vecs = [vecs[i] for i in keep]
            X = np.asarray(vecs, dtype=np.float64)
            X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
            sims = X @ cents.T
            # stable: tied centroid similarities probe the lowest list id,
            # deterministically, instead of quicksort's arbitrary pick
            order = np.argsort(-sims, axis=1, kind="stable")[:, :top_n]
            out_ids, out_vecs, out_lists = [], [], []
            for i, row_lists in enumerate(order):
                for lid in row_lists:
                    out_ids.append(ids[i])
                    out_vecs.append(vecs[i])
                    out_lists.append(int(lid))
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(out_ids, pa.string()),
                    pa.array(out_vecs, pa.list_(pa.float64())),
                    pa.array(out_lists, pa.int32()),
                ],
                names=["id", "vec", "list_id"],
            )

    return fn


def _ivf_prep(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    return df.select(
        F.col(id_col).cast("string").alias("id"),
        F.col(vec_col).cast("array<double>").alias("vec"),
    )


@dataclass(frozen=True)
class IvfIndex:
    """A built IVF index: both halves are plain DataFrames, so the corpus
    GEMM pass is paid ONCE and the index persists as ordinary tables --
    write ``assignments`` parquet-partitioned by list_id and ``centroids``
    as a tiny side table, read them back, and query forever.

    ``centroid_list`` is a driver-side cache of the centroid matrix (KBs):
    ivf_build fills it so same-session queries skip the collect of the
    centroids table; an index reloaded from disk leaves it None and
    ivf_query collects the table instead."""

    assignments: DataFrame  # (corpus_id, corpus_vec, list_id)
    centroids: DataFrame  # (list_id, centroid)
    centroid_list: list | None = None


def ivf_build(
    corpus: DataFrame,
    dim: int,
    n_lists: int = 16,
    sample_size: int = 2048,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> IvfIndex:
    """Train the coarse quantizer and assign every corpus vector to its
    nearest inverted list -- the expensive, ONCE-per-corpus half of IVF.

    Centroids train driver-side on a deterministic ``sample_size``-row
    sample (KB-scale collect, documented tradeoff); assignment is one
    Arrow-batched GEMM pass over the corpus.
    """
    C = _train_ivf_centroids(corpus, n_lists, sample_size, id_col, vec_col)
    spark = corpus.sparkSession
    bc = spark.sparkContext.broadcast(C.tolist())
    assignments = (
        _ivf_prep(corpus, id_col, vec_col)
        .mapInArrow(_ivf_assign_fn(bc, 1), _ivf_assign_schema())
        .select(
            F.col("id").alias("corpus_id"),
            F.col("vec").alias("corpus_vec"),
            "list_id",
        )
    )
    centroid_list = [list(map(float, c)) for c in C.tolist()]
    centroids = spark.createDataFrame(
        list(enumerate(centroid_list)), "list_id int, centroid array<double>"
    )
    return IvfIndex(
        assignments=assignments, centroids=centroids, centroid_list=centroid_list
    )


def ivf_query(
    index: IvfIndex,
    queries: DataFrame,
    k: int = 5,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Query a built :class:`IvfIndex`: queries probe their n_probe nearest
    lists, exact cosine rerank inside the probed lists.  The per-query cost
    is n_probe/n_lists of the corpus; the corpus itself is never re-assigned
    (that GEMM was paid in :func:`ivf_build`)."""
    if index.centroid_list is not None:  # same-session: skip the collect
        cents = index.centroid_list
    else:  # reloaded-from-disk index: n_lists rows, KBs
        rows = index.centroids.orderBy("list_id").collect()
        cents = [list(r["centroid"]) for r in rows]
    spark = queries.sparkSession
    bc = spark.sparkContext.broadcast(cents)

    query_probes = _ivf_prep(queries, id_col, vec_col).mapInArrow(
        _ivf_assign_fn(bc, n_probe), _ivf_assign_schema()
    )
    q = query_probes.select(
        F.col("id").alias("query_id"), F.col("vec").alias("query_vec"), "list_id"
    )
    joined = (
        index.assignments.join(F.broadcast(q), "list_id")
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


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_lists: int = 16,
    n_probe: int = 4,
    sample_size: int = 2048,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF (inverted-file) ANN: spherical-k-means coarse quantizer, corpus
    partitioned into n_lists inverted lists, queries probe their n_probe
    nearest lists, exact cosine rerank inside the probed lists.

    The 100TB shape: centroids are a driver-side broadcast (KBs), list
    assignment is one Arrow-batched GEMM pass over the corpus, and each
    query touches n_probe/n_lists of the data.  Recall is tunable via
    n_probe.  One-shot convenience over :func:`ivf_build` +
    :func:`ivf_query`; use those directly to pay the corpus pass once
    across many query batches.
    """
    index = ivf_build(corpus, dim, n_lists, sample_size, id_col, vec_col)
    return ivf_query(index, queries, k, n_probe, id_col, vec_col)


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_bits: int = 16,
    n_bands: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: str = "random",
) -> DataFrame:
    """Banded ANN: score only candidates sharing at least one band bucket.
    Recall < 1 by design (tunable via n_bands/n_bits); tests measure it
    against brute_force_topk.  See ``lsh_signatures`` for ``planes``."""
    c = lsh_signatures(corpus, dim, n_bits, n_bands, id_col, vec_col, planes).select(
        F.col("id").alias("corpus_id"),
        _as_double_vec(F.col("vec")).alias("corpus_vec"),
        "bucket",
    )
    q = lsh_signatures(queries, dim, n_bits, n_bands, id_col, vec_col, planes).select(
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


def quantize_embeddings(
    emb_df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Symmetric per-vector int8 quantization: the storage/bandwidth lever
    for 100 TB embedding tables (float32 -> int8 is a 4x shuffle/scan
    reduction; ANN rerank reads the quantized table and dequantizes only
    candidate rows).

    Output: ``(vec_id, scale, qvec array<int>)`` with
    ``scale = max(|x|)/127`` and ``q_i = round(x_i / scale)`` in
    [-127, 127]; an all-zero vector gets scale 0 and zero codes.
    Dequantization ``q_i * scale`` has per-element error <= scale/2.

    Entirely JVM-side higher-order functions (one pass per row, no
    shuffle, no Python), and integer-exact across engines -- the round
    mode (half away from zero) matches DuckDB, so the driver oracle
    reproduces the exact codes.
    """
    # vec/amax staged as child-projection columns: amax is referenced 3x
    # (guard, lambda capture, scale) and vec 3x.  Measured ~10% at
    # 100k x 256-dim -- NOT the r5 per-lambda-inlining blowup (an outer
    # expression captured by a transform lambda evaluates per ROW, unlike
    # the per-slice re-inlining that hit the gram windows) -- but staging
    # keeps the multi-ref rule uniform and the plan readable.
    d = emb_df.withColumn("__qe_vec", _as_double_vec(F.col(vec_col))).withColumn(
        "__qe_amax",
        F.array_max(F.transform(F.col("__qe_vec"), lambda x: F.abs(x))),
    )
    vec = F.col("__qe_vec")
    amax = F.col("__qe_amax")
    qvec = F.when(
        amax > 0.0,
        F.transform(vec, lambda x: F.round(x * F.lit(127.0) / amax).cast("int")),
    ).otherwise(F.transform(vec, lambda x: F.lit(0)))
    # scale is exact (callers dequantize with it; rounding it would leak
    # up to |q|*round_err into the reconstruction bound) -- display/oracle
    # layers round for representation stability
    return d.select(
        F.col(id_col), (amax / F.lit(127.0)).alias("scale"), qvec.alias("qvec")
    )


def quantization_error_stats(
    emb_df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """One row per vector with the reconstruction quality of
    :func:`quantize_embeddings`: max |x - q*scale| must be <= scale/2 and
    the cosine between original and dequantized vectors ~1.  The
    monitoring twin a pipeline runs before committing to int8 storage."""
    q = quantize_embeddings(emb_df, id_col, vec_col)
    joined = emb_df.select(
        F.col(id_col), _as_double_vec(F.col(vec_col)).alias("vec")
    ).join(q, id_col)
    deq = F.transform("qvec", lambda x: x * F.col("scale"))
    abs_err = F.array_max(
        F.zip_with("vec", deq, lambda a, b: F.abs(a - b))
    )
    # an all-zero vector has no direction to keep: cosine is 1.0 by
    # convention (and dividing by its zero norm would throw under ANSI)
    cos = F.when(F.col("scale") > 0.0, F.round(_cosine(F.col("vec"), deq), 6)).otherwise(
        F.lit(1.0)
    )
    return joined.select(
        id_col,
        "scale",
        F.round(abs_err, 9).alias("max_abs_err"),
        cos.alias("cosine_kept"),
    )
