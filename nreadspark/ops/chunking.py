"""Document chunking + shard packing for training-data pipelines.

Two operators every LLM data pipeline needs after curation:

* :func:`chunk_documents` -- split each document into overlapping
  word-window chunks (the context-length prep step before tokenization);
* :func:`pack_shards` -- assign documents to fixed-budget shards (the
  sequence-packing prep step that keeps training batches dense).

Both are pure JVM DataFrame transforms (higher-order array functions /
window aggregates) -- no Python in the data path -- and both have exact
SQL twins, so the driver oracle checks them bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _words_col(text_col: str):
    """Whitespace-robust tokenization: ``split`` emits empty tokens at
    tab/newline edges (``trim`` strips only ASCII spaces, and a trailing
    ``\\n`` yields a phantom '' word), so filter them out -- a
    whitespace-only document then has size 0, no special-casing.  SQL
    twin: ``list_filter(string_split_regex(text, '\\s+'), t -> t <> '')``."""
    return F.filter(
        F.split(F.col(text_col), r"\s+"), lambda t: t != ""
    )


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    max_words: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """Sliding word-window chunking: each document becomes ceil-strided
    chunks of ``max_words`` words advancing by ``max_words - overlap``.

    Output: ``(doc_id, chunk_id, chunk_text, n_words)`` -- chunk_id is the
    0-based window index, n_words the chunk's actual word count (the final
    chunk may be shorter).  Documents with no words (empty/whitespace
    text) produce NO rows, mirroring ``line_dedup``'s per-doc contract.

    A trailing window whose content is already fully contained in the
    previous chunk is never generated: window starts stop at
    ``n_words - overlap`` (any later start covers only words the previous
    window -- which by then reaches the document end -- already emitted,
    and duplicated tails over-weight document endings in training data).
    Coverage still holds: the last generated start is within ``max_words``
    of the end.

    Scale shape: one projection pass -- ``split`` -> ``sequence`` of
    window starts -> ``transform``+``slice`` -> ``posexplode`` -- entirely
    in whole-stage codegen with NO shuffle; chunk rows inherit the input's
    partitioning.  At 100 TB this is the operator you want map-side: the
    (doc -> chunks) expansion happens inside the scan stage and flows
    straight to the sink or the next map-side op.
    """
    if not 0 <= overlap < max_words:
        raise ValueError(
            f"need 0 <= overlap ({overlap}) < max_words ({max_words}): a "
            "negative overlap silently skips words between windows"
        )
    stride = max_words - overlap
    words = _words_col(text_col)
    n = F.size(words)
    last_start = F.greatest(n - overlap, F.lit(1))
    starts = F.when(n > 0, F.sequence(F.lit(1), last_start, F.lit(stride))).otherwise(
        F.array().cast("array<int>")
    )
    # build (text, count) per window in ONE pass over the word array: the
    # count is closed-form from the start offset -- re-splitting chunk_text
    # would regex-scan the whole corpus (plus overlap amplification) twice
    chunks = F.transform(
        starts,
        lambda s: F.struct(
            F.concat_ws(" ", F.slice(words, s, max_words)).alias("chunk_text"),
            F.least(n - s + 1, F.lit(max_words)).cast("bigint").alias("n_words"),
        ),
    )
    return (
        df.select("doc_id", F.posexplode(chunks).alias("chunk_id", "chunk"))
        .select(
            "doc_id",
            F.col("chunk_id").cast("int").alias("chunk_id"),
            F.col("chunk.chunk_text").alias("chunk_text"),
            F.col("chunk.n_words").alias("n_words"),
        )
    )


def pack_shards(
    df: DataFrame,
    text_col: str = "text",
    words_per_shard: int = 2048,
    n_buckets: int = 16,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Greedy fixed-budget shard assignment: documents are ordered
    deterministically within ``n_buckets`` hash buckets and packed into
    shards of ~``words_per_shard`` words by running word-count offset
    (a document is assigned to the shard its STARTING offset falls in, so
    shards can overflow by at most one document -- the standard greedy
    packing used for training-shard construction).

    Output: ``(doc_id, bucket, shard_id, n_words)``; the global shard key
    is ``(bucket, shard_id)``.

    Scale shape: ONE shuffle (hash repartition on the deterministic
    ``xxhash64(doc_id)`` bucket) followed by a per-bucket sort + running
    sum -- the window partitions by bucket, so no single-partition global
    sort exists and the packing parallelizes across buckets.  Bucket count
    trades shard-size uniformity against parallelism; at 10^12 docs use
    O(cluster cores) buckets.  Deterministic: same input -> same shards on
    any cluster size (bucket and order derive from doc_id alone).

    ``hash_fn``: 'xxhash64' (default, JVM-native) or 'md5' (first 8 md5
    hex chars -- SQL-replicable so an external engine can reproduce the
    exact bucket assignment for correctness oracles; same convention as
    the MinHash signatures).
    """
    from ..lineage import bucket_col, md5_bucket_col

    if hash_fn not in ("xxhash64", "md5"):
        # a typo ('MD5', 'xxHash') must not silently fall back and change
        # every bucket/shard assignment
        raise ValueError(f"hash_fn must be 'xxhash64' or 'md5', got {hash_fn!r}")
    bucket = (
        md5_bucket_col(n_buckets) if hash_fn == "md5" else bucket_col(n_buckets)
    )
    n_words = F.size(_words_col(text_col)).cast("bigint")
    bucketed = df.select(
        "doc_id",
        bucket.cast("int").alias("bucket"),
        n_words.alias("n_words"),
    )
    w = Window.partitionBy("bucket").orderBy("doc_id")
    cum_before = F.coalesce(
        F.sum("n_words").over(w.rowsBetween(Window.unboundedPreceding, -1)), F.lit(0)
    )
    return bucketed.select(
        "doc_id",
        "bucket",
        F.floor(cum_before / words_per_shard).cast("bigint").alias("shard_id"),
        "n_words",
    )
