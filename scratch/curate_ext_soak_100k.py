"""100k-document soak of the EXTENDED curation pipeline (quality rules ->
model_filter -> line_clean -> decontam -> pii_scrub -> pairs ->
survivors; seven stages since round 6) with planted ground truth for
every stage, plus a kill-and-resume leg.

Usage: python scratch/curate_ext_soak_100k.py
"""

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "jobs"))

os.environ.setdefault("PYSPARK_SUBMIT_ARGS", "--driver-memory 8g pyspark-shell")

OUT = "/tmp/r5_curate_ext_soak"

GOOD = "the committee published a careful report, with several findings, and it ends well"
SPAM = "casino bonus click now, free spins jackpot winner, subscribe subscribe now"
LEAK = "held out benchmark phrase alpha beta gamma delta epsilon zeta eta theta iota kappa"


def main() -> None:
    from pyspark.sql import functions as F

    import bench as bench_mod
    from curate import curate_resumable

    from nreadspark.ops.quality_model import train_quality_model

    shutil.rmtree(OUT, ignore_errors=True)
    spark = bench_mod._session(32)
    spark.range(1000).selectExpr("sum(id)").collect()

    # 100k docs: 5% spam (planted for the model), 2% leaked (planted for
    # decontam), 3% exact near-dups of doc_id-1, rest unique-ish clean
    words = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(1), F.lit(12)),
            lambda i: F.concat(F.lit("w"), F.pmod(F.xxhash64(F.col("id") * 131 + i), F.lit(99991)).cast("string")),
        ),
    )
    # every 10th doc carries a plantable email for the pii stage -- BEFORE
    # the terminal period, or the quality stage's no_terminal_punct rule
    # drops the doc first and pii never sees it (found by this soak's
    # zero-redaction run: stage ORDER is part of the semantics)
    pii_mark = F.when(
        F.pmod("id", F.lit(10)) == 4,
        F.concat(F.lit(" contact user"), F.col("id").cast("string"), F.lit("@example.org")),
    ).otherwise(F.lit(""))
    base = F.concat(F.lit(GOOD + " "), words, pii_mark, F.lit(", and a proper ending."))
    text = (
        F.when(F.pmod("id", F.lit(20)) == 3, F.lit(SPAM + ", again and again."))
        .when(F.pmod("id", F.lit(50)) == 7, F.concat(F.lit(f"fine doc, {LEAK}, ending well "), words, F.lit(".")))
        .otherwise(base)
    )
    docs = spark.range(100_000).select(
        F.col("id").cast("string").alias("doc_id"), text.alias("text")
    ).localCheckpoint()

    labeled = spark.createDataFrame(
        [(i, GOOD + f" variant {i}.", 1) for i in range(12)]
        + [(100 + i, SPAM + f" variant {i}.", 0) for i in range(12)],
        "doc_id long, text string, label int",
    )
    model = train_quality_model(labeled, n_buckets=512)
    eval_df = spark.createDataFrame(
        [("e1", f"q: {LEAK} a")], "eval_id string, text string"
    )

    kw = dict(
        min_words=5, minhash_threshold=0.7, line_min_repeats=200_000,
        line_delimiter=",", n_buckets=32,
        quality_model=model, decontam_eval=eval_df, decontam_n=8,
        pii=True,
        clean_stages=False, input_fingerprint="soak:100k",
    )
    t0 = time.perf_counter()
    df, stats = curate_resumable(spark, docs, OUT, **kw)
    full_s = time.perf_counter() - t0

    n_spam = 100_000 // 20
    n_leak = len([i for i in range(100_000) if i % 50 == 7 and i % 20 != 3])
    n_email = len([i for i in range(100_000)
                   if i % 10 == 4 and i % 20 != 3 and i % 50 != 7])
    report = {
        "full_s": round(full_s, 1),
        "stage_wall_s": stats.get("stage_wall_s"),
        "pii_redactions": stats.get("pii_redactions"),
        "expect_emails": n_email,
        "model_dropped": stats.get("model_dropped"),
        "expect_spam": n_spam,
        "decontaminated_dropped": stats.get("decontaminated_dropped"),
        "expect_leak": n_leak,
        "surviving": stats.get("surviving_docs"),
    }
    assert stats["pii_redactions"]["emails"] == n_email, report
    print(json.dumps(report))

    # resume leg: rerun must short-circuit through all six stages
    t0 = time.perf_counter()
    df2, stats2 = curate_resumable(spark, docs, OUT, **kw)
    print(json.dumps({
        "resume_s": round(time.perf_counter() - t0, 1),
        "resumed_stages": stats2["resumed_stages"],
        "surviving_match": stats2.get("surviving_docs") == stats.get("surviving_docs"),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
