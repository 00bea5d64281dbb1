"""spark-submit entry point: the full corpus-curation pipeline over an
extracted-documents table -- the stage a training-data team runs AFTER
jobs/extract.py:

    spark-submit --py-files nreadspark.zip jobs/curate.py \
        --input /path/to/extracted --output /path/to/curated \
        [--text-col text] [--min-words 5] [--minhash-threshold 0.7] \
        [--line-min-repeats 2] [--synthetic N]

Stages (each pure-DataFrame, composing the ops/ layer):

1. **Quality filter** (`c4_quality_filter`): rule-based keep/drop with
   explainable reasons; dropped docs are counted per reason.
2. **Boilerplate line removal** (`line_dedup`): cross-document repeated
   lines stripped, text rewritten.
3. **Near-duplicate clustering**: MinHash/LSH candidates -> exact Jaccard
   verify -> `connected_components` -> `keep_canonical`: only each
   cluster's minimum-id document survives.
4. **Write** the surviving (doc_id, <text_col>) table + a JSON summary
   with per-stage counts on stdout.

No counterpart exists in the reference (it is a per-page library); this is
the engine's "what you actually run at 10^12 documents" surface, and every
stage is the oracle-checked operator from __spark_entry__.py.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def curate(
    docs,
    text_col: str = "text",
    min_words: int = 5,
    minhash_threshold: float = 0.7,
    line_min_repeats: int = 2,
    line_delimiter: str = "\n",
):
    """The pipeline as a reusable function: (surviving_df, stats dict).

    ``docs`` needs (doc_id, <text_col>).  Stages run in quality -> line-dedup
    -> near-dup order so the expensive MinHash pass sees only surviving,
    boilerplate-free text.  ``line_delimiter`` defaults to newline -- real
    extracted text is line-structured; pass ',' for clause-structured
    corpora like the synthetic test tables.

    Caching contract: ``cleaned`` and ``verified`` stay persisted because
    the RETURNED surviving frame is computed from them (the caller's write
    reuses the cache); the input frame is unpersisted as soon as the
    line-dedup stage has materialized.  One curate() call per session is
    the intended shape (it is a job, not a library primitive).
    """
    from pyspark import StorageLevel
    from pyspark.sql import functions as F

    from nreadspark.ops.dedup import (
        keep_canonical,
        line_dedup,
        minhash_lsh_candidates,
        verify_jaccard,
    )
    from nreadspark.ops.textstats import c4_quality_filter

    # each stage's output feeds both the next stage AND its stats action --
    # persist the hand-off frames so no stage recomputes its predecessors
    docs = docs.persist(StorageLevel.MEMORY_AND_DISK)
    stats: dict = {"input_docs": docs.count()}

    # 1. rule-based quality filter
    verdicts = c4_quality_filter(docs, text_col=text_col, min_words=min_words)
    reason_counts = {
        r["reasons"]: r["n"]
        for r in verdicts.filter(~F.col("keep"))
        .groupBy("reasons")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    kept = docs.join(verdicts.filter("keep").select("doc_id"), "doc_id")
    stats["quality_dropped"] = sum(reason_counts.values())
    stats["quality_drop_reasons"] = reason_counts

    # 2. cross-document boilerplate line removal (keep every doc: a doc
    # whose text was ALL boilerplate still flows to the dedup stage)
    cleaned = line_dedup(
        kept, text_col=text_col, delimiter=line_delimiter,
        min_repeats=line_min_repeats, keep_all_docs=True
    ).select(
        "doc_id", F.col("clean_text").alias(text_col), "n_removed"
    ).persist(StorageLevel.MEMORY_AND_DISK)
    stats["boilerplate_lines_removed"] = (
        cleaned.agg(F.sum("n_removed")).collect()[0][0] or 0
    )
    docs.unpersist()  # cleaned is materialized; the input cache is done
    cleaned = cleaned.drop("n_removed")

    # 3. near-dup: candidates -> exact verify -> components -> survivors.
    # Documents EMPTIED by line dedup are excluded from the pair graph: all
    # empty texts tokenize identically (Jaccard 1.0), so leaving them in
    # would cluster mutually unrelated documents as "duplicates" of each
    # other.  They bypass dedup and survive (stats expose the count so a
    # caller can drop them).
    dedup_input = cleaned.filter(F.length(text_col) > 0)
    stats["emptied_by_line_dedup"] = stats["input_docs"] - stats[
        "quality_dropped"
    ] - dedup_input.count()
    candidates = minhash_lsh_candidates(dedup_input, text_col=text_col)
    verified = verify_jaccard(
        dedup_input, candidates, text_col=text_col, threshold=minhash_threshold
    ).select("doc_id_a", "doc_id_b").persist(StorageLevel.MEMORY_AND_DISK)
    surviving = keep_canonical(cleaned, verified)
    stats["near_dup_pairs"] = verified.count()
    stats["surviving_docs"] = surviving.count()
    return surviving, stats


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--input", help="input table path (parquet dir)")
    parser.add_argument("--output", required=True)
    parser.add_argument("--text-col", default="text")
    parser.add_argument("--min-words", type=int, default=5)
    parser.add_argument("--minhash-threshold", type=float, default=0.7)
    parser.add_argument("--line-min-repeats", type=int, default=2)
    parser.add_argument(
        "--line-delimiter", default="\n",
        help="boilerplate line delimiter (default newline; ',' for clause-structured text)",
    )
    parser.add_argument(
        "--synthetic", type=int, default=0,
        help="curate N synthetic docs instead of reading --input",
    )
    parser.add_argument("--master", default=None)
    args = parser.parse_args()

    from pyspark.sql import SparkSession

    from nreadspark.pipeline import configure_session_defaults

    builder = SparkSession.builder.appName("nreadspark-curate")
    if args.master:
        builder = builder.master(args.master)
    spark = configure_session_defaults(builder).getOrCreate()

    if args.synthetic:
        from pyspark.sql import functions as F

        from nreadspark.corpus import build_corpus_df

        docs = build_corpus_df(spark, args.synthetic).select(
            "doc_id",
            F.concat_ws(
                " ", F.transform("spans", lambda s: s["text"])
            ).alias(args.text_col),
        )
    elif args.input:
        docs = spark.read.parquet(args.input).select("doc_id", args.text_col)
    else:
        parser.error("either --input or --synthetic is required")
        return

    surviving, stats = curate(
        docs,
        text_col=args.text_col,
        min_words=args.min_words,
        minhash_threshold=args.minhash_threshold,
        line_min_repeats=args.line_min_repeats,
        line_delimiter=args.line_delimiter,
    )
    surviving.write.mode("overwrite").parquet(args.output)
    print(json.dumps(stats))
    spark.stop()


if __name__ == "__main__":
    main()
