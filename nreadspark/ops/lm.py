"""Count-based n-gram language-model familiarity scoring.

CCNet ranks web documents by the perplexity of a KenLM 5-gram model and
keeps the head of the distribution -- the single most effective public
quality signal after dedup.  A float perplexity cannot be promised
bit-identical across engines (log/exp libm differences, sum order), so
this module implements the same *ranking* signal in exact integer
arithmetic: each word bigram scores ``floor(log2(count + 1))`` against a
trained count table, and a document's familiarity is the mean bigram
score -- ONE division of exact BIGINT sums.  Common constructions (seen
often in the reference corpus) score high; gibberish, word salad and
boilerplate-free spam score near zero.  Plug a real LM by swapping the
counts table; the pipeline shape is identical.

The log2 bucket is computed WITHOUT floats: ``floor(log2(n)) ==
length(bin(n)) - 1`` for any positive BIGINT -- string length of the
binary representation, exact in every engine.

Scale shapes:

- **training** is tokenize + bigram zip in the scan stage (staged child
  projections -- the multi-reference rule) -> ONE map-side-combined hash
  agg on the gram.  The counts table is vocabulary²-bounded but
  Zipf-concentrated; ``min_count`` prunes the hapax tail, which is most
  of the rows.
- **scoring** explodes bigrams, joins the counts table (broadcast by
  default -- a pruned bigram table is ~10^7 rows / ~100 MB; pass
  ``broadcast=False`` past that), and aggregates per doc_id with map-side
  partials: the corpus text itself never shuffles, only fixed-width
  (doc_id, score) partials move -- the ``quality_model_score`` contract.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _bigrams_col(text_col: str) -> tuple[Column, Column]:
    """(words, bigrams) column pair for staging: lowercased whitespace
    tokens and their adjacent-pair join.  Returns expressions over a
    ``__lm_w`` staged column so callers control the child projection."""
    words = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    w = F.col("__lm_w")
    n = F.size(w)
    bigrams = F.zip_with(
        F.slice(w, 1, n - 1),
        F.slice(w, 2, n - 1),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    return words, bigrams


def train_bigram_counts(
    df: DataFrame, text_col: str = "text", min_count: int = 1
) -> DataFrame:
    """(gram, n): word-bigram counts over a reference corpus -- the
    "model".  Tokens are lowercased whitespace words (the repo-wide
    convention; swap in a tokenizer column upstream for subword LMs).
    ``min_count`` drops rare grams: the Zipf tail is most of the distinct
    grams but contributes almost nothing to scoring (an unseen gram and a
    once-seen gram score 0 and 1).

    Shape: tokenize + bigram zip in the scan projection (word array
    staged in a child projection -- referenced twice by the slices),
    explode, ONE map-side-combined hash agg on the gram."""
    words, bigrams = _bigrams_col(text_col)
    grams = (
        df.select(words.alias("__lm_w"))
        .select(F.explode(bigrams).alias("gram"))
        .groupBy("gram")
        .agg(F.count("*").alias("n"))
    )
    if min_count > 1:
        grams = grams.filter(F.col("n") >= min_count)
    return grams


def lm_familiarity(
    df: DataFrame,
    counts: DataFrame,
    text_col: str = "text",
    broadcast: bool = True,
) -> DataFrame:
    """(doc_id, n_bigrams, fam_sum, familiarity): mean integer-log2 bigram
    familiarity of each document against ``counts`` (a
    :func:`train_bigram_counts` frame).  Per bigram the score is
    ``floor(log2(n + 1))`` -- 0 for unseen grams, growing with corpus
    frequency; ``fam_sum`` is the exact BIGINT sum, ``familiarity`` its
    mean (ONE exact-integer division, rounded to 6 places), NULL for
    documents with fewer than two tokens.

    Filtering convention: downstream keeps the familiarity head (e.g.
    ``familiarity >= 2``) or buckets by it for mixture planning, exactly
    how CCNet buckets by perplexity thirds."""
    words, bigrams = _bigrams_col(text_col)
    exploded = (
        df.select("doc_id", words.alias("__lm_w"))
        .select("doc_id", F.explode(bigrams).alias("gram"))
    )
    c = F.broadcast(counts) if broadcast else counts
    scored = exploded.join(c, "gram", "left").select(
        "doc_id",
        # floor(log2(n+1)) == length(bin(n+1)) - 1, exact for any BIGINT
        (F.length(F.bin(F.coalesce(F.col("n"), F.lit(0)) + 1)) - 1)
        .cast("bigint")
        .alias("__lm_s"),
    )
    agg = scored.groupBy("doc_id").agg(
        F.count("*").alias("n_bigrams"), F.sum("__lm_s").alias("fam_sum")
    )
    return (
        df.select("doc_id")
        .join(agg, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_bigrams", F.lit(0)).cast("bigint").alias("n_bigrams"),
            F.coalesce("fam_sum", F.lit(0)).cast("bigint").alias("fam_sum"),
            F.round(F.col("fam_sum") / F.col("n_bigrams"), 6).alias("familiarity"),
        )
    )


def filter_unfamiliar(
    df: DataFrame,
    counts: DataFrame,
    min_familiarity: float,
    text_col: str = "text",
    broadcast: bool = True,
) -> DataFrame:
    """Survivor composition: keep documents whose mean bigram familiarity
    reaches ``min_familiarity`` (documents too short to score are kept --
    length filtering is a different rule's job)."""
    fam = lm_familiarity(df, counts, text_col, broadcast)
    keep = fam.filter(
        F.col("familiarity").isNull() | (F.col("familiarity") >= min_familiarity)
    ).select("doc_id")
    return df.join(keep, "doc_id", "left_semi")
