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


#: Heuristic sentence segmentation: a run of non-terminators followed by
#: its terminator run ('Mr.' abbreviation handling is a model problem, not
#: a regex one -- this is the C4-grade splitter).  Restricted to constructs
#: with IDENTICAL Java-regex/RE2 semantics (character classes, + and *,
#: whole-string-anchored ^$ in the fragment filter), so the DuckDB twin
#: uses the same pattern strings.
SENTENCE_PATTERN = "[^.!?]+[.!?]*"

#: post-split noise filter: a fragment that trims to '' (whitespace between
#: terminators) or to bare terminators ('...' with no content) is not a
#: sentence
_BARE_TERMINATORS = "^[.!?]+$"


def _sentences_col(text_col: str):
    """Trimmed, noise-filtered sentences (see the two patterns above)."""
    return F.filter(
        F.transform(
            F.regexp_extract_all(F.col(text_col), F.lit(SENTENCE_PATTERN), 0),
            # explicit 1-arg lambda: F.transform feeds 2-arity callables the
            # element INDEX as a second argument, which F.trim would accept
            # as a trim-character set
            lambda s: F.trim(s),
        ),
        lambda s: (s != "") & ~s.rlike(_BARE_TERMINATORS),
    )


def split_sentences(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, sentence_id, sentence): heuristic sentence segmentation
    (see :data:`SENTENCE_PATTERN`).  Documents with NULL text or no
    extractable sentence produce NO rows (the per-doc explode contract
    shared with :func:`chunk_documents`).

    Scale shape: one codegen projection -> posexplode, zero shuffles; rows
    inherit the input partitioning, so the downstream per-sentence ops
    (dedup, quality, embedding) start map-side."""
    return df.select(
        "doc_id",
        F.posexplode(_sentences_col(text_col)).alias("sentence_id", "sentence"),
    ).select(
        "doc_id", F.col("sentence_id").cast("int").alias("sentence_id"), "sentence"
    )


def _unit_col(text_col: str, unit: str):
    """The chunking/packing unit array: 'words' (whitespace-robust split),
    'tokens' (the ``TOKEN_PATTERN`` regex pre-tokenizer: word runs +
    single punctuation marks -- the unit a subword tokenizer's
    pre-tokenization stage produces, 20-40 % denser than words on
    punctuated web text) or 'sentences' (:data:`SENTENCE_PATTERN` -- for
    sentence-window chunks; note chunks re-join sentences with single
    spaces like token mode)."""
    if unit == "words":
        return _words_col(text_col)
    if unit == "tokens":
        from .textstats import TOKEN_PATTERN

        return F.regexp_extract_all(F.col(text_col), F.lit(TOKEN_PATTERN), 0)
    if unit == "sentences":
        return _sentences_col(text_col)
    raise ValueError(
        f"unit must be 'words', 'tokens' or 'sentences', got {unit!r}"
    )


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    max_words: int = 64,
    overlap: int = 16,
    unit: str = "words",
) -> DataFrame:
    """Sliding window chunking: each document becomes ceil-strided
    chunks of ``max_words`` units advancing by ``max_words - overlap``.

    ``unit``: 'words' (default) windows whitespace words; 'tokens' windows
    the regex pre-tokenizer pieces (see :func:`_unit_col`) -- the
    context-length-faithful mode, since model context is budgeted in
    tokens, not words.  Token-mode chunks re-join with single spaces (the
    lossless byte-exact variant would carry offsets; training chunks do
    not need it).

    Output: ``(doc_id, chunk_id, chunk_text, n_words)`` (token mode names
    the count ``n_tokens``) -- chunk_id is the 0-based window index, the
    count the chunk's actual unit count (the final chunk may be shorter).
    Documents with no units (empty/whitespace text) produce NO rows,
    mirroring ``line_dedup``'s per-doc contract.

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
    count_alias = {"words": "n_words", "tokens": "n_tokens"}.get(unit, "n_units")
    # materialize the unit array in a CHILD projection: an expression
    # referenced inside a higher-order-function lambda is inlined into
    # every lambda evaluation by codegen, so slicing the split/regex
    # expression directly would re-tokenize the document once PER WINDOW
    # (quadratic on long documents -- the same fix as dedup._exploded_grams)
    with_units = df.select("doc_id", _unit_col(text_col, unit).alias("__u"))
    words = F.col("__u")
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
            F.least(n - s + 1, F.lit(max_words)).cast("bigint").alias("n_units"),
        ),
    )
    return (
        with_units.select("doc_id", F.posexplode(chunks).alias("chunk_id", "chunk"))
        .select(
            "doc_id",
            F.col("chunk_id").cast("int").alias("chunk_id"),
            F.col("chunk.chunk_text").alias("chunk_text"),
            F.col("chunk.n_units").alias(count_alias),
        )
    )


def pack_shards(
    df: DataFrame,
    text_col: str = "text",
    words_per_shard: int = 2048,
    n_buckets: int = 16,
    hash_fn: str = "xxhash64",
    budget_unit: str = "words",
    size_col: str | None = None,
) -> DataFrame:
    """Greedy fixed-budget shard assignment: documents are ordered
    deterministically within ``n_buckets`` hash buckets and packed into
    shards of ~``words_per_shard`` budget units by running cost offset
    (a document is assigned to the shard its STARTING offset falls in, so
    shards can overflow by at most one document -- the standard greedy
    packing used for training-shard construction).

    ``budget_unit`` picks the per-document cost (model context is budgeted
    in TOKENS -- word budgets mis-size shards by the word/token rate
    difference):

    * ``'words'`` (default): whitespace word count;
    * ``'tokens'``: regex pre-tokenizer piece count (words + punctuation);
    * ``'est_bpe'``: closed-form BPE-rate estimate
      (:func:`..tokenize.est_bpe_tokens_col` -- ceil(len/4) subword
      tokens per piece), still pure JVM + SQL-twinnable;
    * ``size_col=<column>``: an exact precomputed cost column -- the
      production path for real tokenizer budgets: run
      ``tokenize.count_tokens_bpe`` (or a native tokenizer) once, join,
      pack on its counts.  Overrides ``budget_unit``.

    Output: ``(doc_id, bucket, shard_id, n_words)`` in words mode; other
    budgets name the cost column ``n_units``.  The global shard key is
    ``(bucket, shard_id)``.

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
    if size_col is not None:
        cost, cost_alias = F.col(size_col).cast("bigint"), "n_units"
    elif budget_unit in ("words", "tokens"):
        # greatest(size, 0): F.size of a NULL array (null text) is -1
        # (legacy sizeOfNull) -- a null document costs 0, not -1
        cost = F.greatest(
            F.size(_unit_col(text_col, budget_unit)), F.lit(0)
        ).cast("bigint")
        cost_alias = "n_words" if budget_unit == "words" else "n_units"
    elif budget_unit == "est_bpe":
        from .tokenize import est_bpe_tokens_col

        cost, cost_alias = est_bpe_tokens_col(text_col), "n_units"
    else:
        raise ValueError(
            f"budget_unit must be 'words', 'tokens' or 'est_bpe', got {budget_unit!r}"
        )
    bucketed = df.select(
        "doc_id",
        bucket.cast("int").alias("bucket"),
        cost.alias(cost_alias),
    )
    w = Window.partitionBy("bucket").orderBy("doc_id")
    cum_before = F.coalesce(
        F.sum(cost_alias).over(w.rowsBetween(Window.unboundedPreceding, -1)), F.lit(0)
    )
    return bucketed.select(
        "doc_id",
        "bucket",
        F.floor(cum_before / words_per_shard).cast("bigint").alias("shard_id"),
        cost_alias,
    )
