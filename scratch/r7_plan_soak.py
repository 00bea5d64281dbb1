"""Crawl-planning JOB soak (r7): run_crawl_planning over a 1M-line CDXJ
index (written as text shards, the real input shape) in both modes --
archival re-read and sitemap-refresh (200 sitemap files, 100k declared
URLs) -- plus a resume pass per mode.

Run: python scratch/r7_plan_soak.py
"""
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession, functions as F

N = 1_000_000
N_SITES = 200
PAGES_PER_SITE = 500  # declared per sitemap -> 100k inventory rows


def main():
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from nreadspark.lineage import run_crawl_planning

    # 1M CDXJ lines across 40 text shards (200 sites, ~2.4 captures/key)
    ids = spark.range(N)
    site = F.pmod("id", F.lit(N_SITES)).cast("string")
    page = F.pmod("id", F.lit(420000)).cast("string")
    line = F.concat(
        F.lit("com,site"), site, F.lit(")/p"), page,
        F.lit(" "), F.lpad(F.col("id").cast("string"), 14, "0"),
        F.lit(' {"url": "http://site'), site, F.lit(".com/p"), page,
        F.lit('", "filename": "w'), F.pmod("id", F.lit(100)).cast("string"),
        F.lit('.warc.gz", "offset": '), (F.col("id") * 1000).cast("string"),
        F.lit(', "length": 777, "status": 200, "mime": "text/html", "digest": "-"}'),
    )
    idx_dir = "/tmp/r7_plan_idx"
    shutil.rmtree(idx_dir, ignore_errors=True)
    ids.select(line.alias("line")).repartition(40).write.mode("overwrite").text(idx_dir)

    # 200 sitemap files: 500 urls each; half carry a lastmod AFTER every
    # capture (-> 'modified'), half none (-> 'unknown'); 100 extra urls
    # per site never captured (-> 'new')
    import os
    maps_dir = "/tmp/r7_plan_maps"
    shutil.rmtree(maps_dir, ignore_errors=True)
    os.makedirs(maps_dir)
    from nreadspark.sitemap import build_sitemap_xml
    for s in range(N_SITES):
        entries = []
        for k in range(PAGES_PER_SITE):
            # align with the capture layout (captured pages of site s are
            # p ≡ s mod 200) so declared-vs-captured reasoning has overlap
            p = s + 200 * k
            lastmod = "2097-01-01" if k % 2 == 0 else None
            entries.append((f"http://site{s}.com/p{p}?a=1&b=2" if k % 11 == 5
                            else f"http://site{s}.com/p{p}", lastmod))
        for p in range(100):
            entries.append((f"http://site{s}.com/new{p}", None))
        open(f"{maps_dir}/site{s}.xml", "w").write(build_sitemap_xml(entries))

    prefixes = [f"com,site{s})" for s in range(N_SITES)]

    out_a = "/tmp/r7_plan_out_a"
    shutil.rmtree(out_a, ignore_errors=True)
    t0 = time.monotonic()
    s1 = run_crawl_planning(spark, idx_dir, prefixes, out_a, n_buckets=64,
                            per_domain_per_slot=4)
    w1 = time.monotonic() - t0
    print(f"archival plan: {s1['urls_planned']} urls from {N} index lines "
          f"in {w1:5.1f}s ({N/w1:8.0f} lines/s); buckets {s1['buckets_computed']}")
    t0 = time.monotonic()
    s2 = run_crawl_planning(spark, idx_dir, prefixes, out_a, n_buckets=64,
                            per_domain_per_slot=4)
    print(f"archival resume: skipped {s2['buckets_skipped']}/64 in "
          f"{time.monotonic()-t0:4.1f}s")

    out_r = "/tmp/r7_plan_out_r"
    shutil.rmtree(out_r, ignore_errors=True)
    t0 = time.monotonic()
    r1 = run_crawl_planning(spark, idx_dir, prefixes, out_r,
                            sitemap_glob=maps_dir, n_buckets=64,
                            per_domain_per_slot=4)
    w2 = time.monotonic() - t0
    plan = spark.read.parquet(out_r)
    reasons = {r["reason"]: r["n"] for r in
               plan.groupBy("reason").agg(F.count("*").alias("n")).collect()}
    print(f"refresh plan: {r1['urls_planned']} urls ({reasons}) in {w2:5.1f}s")
    t0 = time.monotonic()
    r2 = run_crawl_planning(spark, idx_dir, prefixes, out_r,
                            sitemap_glob=maps_dir, n_buckets=64,
                            per_domain_per_slot=4)
    print(f"refresh resume: skipped {r2['buckets_skipped']}/64 in "
          f"{time.monotonic()-t0:4.1f}s")
    # sanity: the entity-decoded urls (p%11==5 with query) must be 'new'
    # (their urlkey carries the query; the index never captured it)
    q = plan.filter(F.col("urlkey").contains("?a=1&b=2"))
    n_q = q.count()
    n_q_new = q.filter("reason = 'new'").count()
    print(f"entity-decoded query urls: {n_q} (all new: {n_q == n_q_new})")
    spark.stop()


if __name__ == "__main__":
    main()
