"""Round-6 soak: the new curation ops at 10^6-row scale with planted
ground truth, local[32].

- pii_scrub over 1M docs (1/4 with a planted email, 1/4 ssn+ip, 1/4
  phone): exact per-category totals + throughput.
- tag_blocked_domains over 1M URLs across 100k domains with a 10k-entry
  blocklist: exact blocked count + throughput (broadcast join path).
- spans_to_training_text over 1M interleaved 4-span docs: exact sentinel
  count + throughput (pure projection path).

Run: python scratch/r6_soak_1m.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

N = 1_000_000


def main() -> None:
    from pyspark.sql import SparkSession, functions as F

    from nreadspark.ops.pii import pii_scrub
    from nreadspark.ops.render import spans_to_training_text
    from nreadspark.ops.urls import tag_blocked_domains

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    report = {}

    # --- pii over 1M ------------------------------------------------------
    base = spark.range(N).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("plain words before any identifier appear here "),
            F.when(F.pmod("id", F.lit(4)) == 0,
                   F.concat(F.lit("user"), F.col("id").cast("string"), F.lit("@mail.example.org")))
            .when(F.pmod("id", F.lit(4)) == 1, F.lit("ssn 123-45-6789 at 10.1.2.3"))
            .when(F.pmod("id", F.lit(4)) == 2, F.lit("call 415-555-0100 today"))
            .otherwise(F.lit("nothing sensitive at all")),
            F.lit(" and trailing words to pad the document a little"),
        ).alias("text"),
    ).localCheckpoint()
    t0 = time.perf_counter()
    agg = pii_scrub(base).agg(
        F.sum("n_emails").alias("e"), F.sum("n_ssns").alias("s"),
        F.sum("n_ipv4s").alias("i"), F.sum("n_phones").alias("p"),
    ).collect()[0]
    dt = time.perf_counter() - t0
    expect = N // 4
    report["pii"] = {
        "wall_s": round(dt, 2), "docs_per_s": int(N / dt),
        "emails": (agg["e"], expect), "ssns": (agg["s"], expect),
        "ipv4s": (agg["i"], expect), "phones": (agg["p"], expect),
    }
    assert (agg["e"], agg["s"], agg["i"], agg["p"]) == (expect,) * 4, report

    # --- domains over 1M --------------------------------------------------
    urls = spark.range(N).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("https://cdn.host"), F.pmod("id", F.lit(100_000)).cast("string"),
            F.when(F.pmod("id", F.lit(3)) == 0, ".co.uk").otherwise(".com"),
            F.lit("/page/"), F.col("id").cast("string"),
        ).alias("url"),
    ).localCheckpoint()
    blocklist = [f"host{i}.com" for i in range(15_000) if i % 3 != 0] + [
        f"host{i}.co.uk" for i in range(15_000) if i % 3 == 0
    ]
    t0 = time.perf_counter()
    blocked = tag_blocked_domains(urls, blocklist).filter("blocked").count()
    dt = time.perf_counter() - t0
    # driver-side replication of the rule (a host's copies see DIFFERENT
    # tlds: id = h + 100000*k and 100000 % 3 == 1, so id%3 cycles with k)
    bl = set(blocklist)
    expect_blocked = sum(
        1
        for h in range(15_000)
        for k in range(N // 100_000)
        if ("host%d%s" % (h, ".co.uk" if (h + 100_000 * k) % 3 == 0 else ".com")) in bl
    )
    report["domains"] = {
        "wall_s": round(dt, 2), "urls_per_s": int(N / dt),
        "blocked": (blocked, expect_blocked),
        "blocklist_size": len(blocklist),
    }
    assert blocked == expect_blocked, report

    # --- span rendering over 1M ------------------------------------------
    null_s = F.lit(None).cast("string")

    def span(kind, text, ref, off):
        return F.struct(
            F.lit(kind).alias("kind"), text.alias("text"),
            ref.alias("media_ref"), F.lit(off).cast("int").alias("offset"),
        )

    docs = spark.range(N).select(
        F.col("id").cast("string").alias("doc_id"),
        F.array(
            span("text", F.concat(F.lit("intro paragraph for doc "), F.col("id").cast("string")), null_s, 0),
            span("image", F.lit(""), F.concat(F.lit("img://"), F.col("id").cast("string")), 1),
            span("text", F.lit("middle body text with several words"), null_s, 2),
            span("video", F.lit(""), F.concat(F.lit("vid://"), F.col("id").cast("string")), 3),
        ).alias("spans"),
    ).localCheckpoint()
    t0 = time.perf_counter()
    agg = spans_to_training_text(docs).agg(
        F.sum("n_media_spans").alias("m"),
        F.sum(F.length("text")).alias("chars"),
        F.sum(F.col("text").contains("<|image|>").cast("int")).alias("imgs"),
    ).collect()[0]
    dt = time.perf_counter() - t0
    report["render"] = {
        "wall_s": round(dt, 2), "docs_per_s": int(N / dt),
        "media_spans": (agg["m"], 2 * N), "docs_with_image_sentinel": (agg["imgs"], N),
    }
    assert agg["m"] == 2 * N and agg["imgs"] == N, report

    print(json.dumps(report))
    spark.stop()


if __name__ == "__main__":
    main()
