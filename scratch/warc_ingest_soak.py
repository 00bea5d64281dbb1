"""Round-6 ingestion-tier soak: `run_warc_ingestion` over a directory of
real-shaped `.warc.gz` files (32 files x ~50 MB decompressed each, one
gzip member per record -- the Common Crawl layout scaled down 20x), on
local[32] with 16 buckets.

Measures end-to-end wall + MB/s + docs/s for listing -> streamed record
parse -> charset decode -> extraction kernel -> bucketed parquet +
manifests, then kills one bucket manifest and proves the resume re-pays
exactly that bucket's files.

Run: python scratch/warc_ingest_soak.py
"""

import json
import os
import random
import shutil
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

N_FILES = 32
PAGES_PER_FILE = 400
BODY_WORDS = 120  # ~2.5 KB html/page + padding below

PAD = 20_000  # extra incompressible bytes per page so files have real size


def build_files(root: str) -> tuple[int, int]:
    from nreadspark.warc import _gzip_member, build_http_response, build_warc_record

    rng = random.Random(0)
    total_raw = 0
    n_pages = 0
    for f in range(N_FILES):
        path = os.path.join(root, f"seg-{f:04d}.warc.gz")
        with open(path, "wb") as fh:
            for p in range(PAGES_PER_FILE):
                words = " ".join(
                    f"word{rng.randrange(9999)}" for _ in range(BODY_WORDS)
                )
                # the hidden-comment padding is incompressible, so the
                # compressed files are genuinely ~100 MB-class inputs
                pad = rng.randbytes(PAD).hex()
                html = (
                    f"<html><head><title>Doc {f}-{p} | Soak</title></head>"
                    f"<body><div id='content' class='post'>"
                    f"<p>{words}, with commas, and a real ending.</p>"
                    f"<p>{words}, extended for sibling merge.</p>"
                    f"<!-- {pad} --></div></body></html>"
                ).encode()
                rec = build_warc_record(
                    "response",
                    build_http_response(html),
                    target_uri=f"http://soak.example/{f}/{p}",
                )
                total_raw += len(rec)
                n_pages += 1
                fh.write(_gzip_member(rec))
    return total_raw, n_pages


def main() -> None:
    from pyspark.sql import SparkSession

    from nreadspark.lineage import run_warc_ingestion

    root = "/tmp/warc_ingest_soak"
    out = os.path.join(root, "out")
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root)
    t0 = time.perf_counter()
    total_raw, n_pages = build_files(root)
    comp = sum(
        os.path.getsize(os.path.join(root, f))
        for f in os.listdir(root)
        if f.endswith(".warc.gz")
    )
    print(
        f"fixture: {N_FILES} files, {n_pages} pages, decompressed "
        f"{total_raw / 2**20:.0f} MB, compressed {comp / 2**20:.0f} MB "
        f"(built in {time.perf_counter() - t0:.1f}s)"
    )

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    t0 = time.perf_counter()
    s1 = run_warc_ingestion(spark, os.path.join(root, "*.warc.gz"), out, n_buckets=16)
    wall = time.perf_counter() - t0
    report = {
        "wall_s": round(wall, 1),
        "docs": s1["docs_computed"],
        "docs_per_s": int(s1["docs_computed"] / wall),
        "mb_per_s": round(total_raw / 2**20 / wall, 1),
        "buckets": s1["buckets_computed"],
    }
    assert s1["docs_computed"] == n_pages, s1
    result = spark.read.parquet(out)
    assert result.count() == n_pages
    n_extracted = result.filter("content_extracted").count()
    report["extracted"] = n_extracted
    assert n_extracted == n_pages

    # resume leg: drop one manifest, exactly that bucket's files re-pay
    manifests = sorted(
        p for p in os.listdir(os.path.join(out, "_lineage")) if p.startswith("bucket=")
    )
    victim = os.path.join(out, "_lineage", manifests[0])
    victim_docs = json.load(open(victim))["docs"]
    os.remove(victim)
    t0 = time.perf_counter()
    s2 = run_warc_ingestion(spark, os.path.join(root, "*.warc.gz"), out, n_buckets=16)
    report["resume_s"] = round(time.perf_counter() - t0, 1)
    report["resume_buckets"] = s2["buckets_computed"]
    assert s2["buckets_computed"] == 1 and s2["docs_computed"] == victim_docs, s2
    assert spark.read.parquet(out).count() == n_pages
    print(json.dumps(report))
    spark.stop()
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
