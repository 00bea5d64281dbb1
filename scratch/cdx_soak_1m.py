"""1M-line CDX index soak: parse throughput (cdx_lines), fetch-plan wall
(plan_fetches with a 2-domain prefix selection + latest-capture dedup),
and SURT throughput on 1M URLs -- the index-tier rates that back the
"a domain slice of a 10^12-page crawl is an index query" claim.

Run: python scratch/cdx_soak_1m.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession, functions as F

from nreadspark.cdx import cdx_lines, plan_fetches, surt_key_col

N = 1_000_000


def main():
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # materialize 1M CDXJ lines (200 sites x 5000 pages, ~2.4 captures/key)
    ids = spark.range(N)
    site = F.pmod("id", F.lit(200)).cast("string")
    page = F.pmod("id", F.lit(420000)).cast("string")
    line = F.concat(
        F.lit("com,site"), site, F.lit(")/p"), page,
        F.lit(" "), F.lpad(F.col("id").cast("string"), 14, "0"),
        F.lit(' {"url": "http://site'), site, F.lit(".com/p"), page,
        F.lit('", "filename": "w'), F.pmod("id", F.lit(100)).cast("string"),
        F.lit('.warc.gz", "offset": '), (F.col("id") * 1000).cast("string"),
        F.lit(', "length": 777, "status": 200, "mime": "text/html", "digest": "-"}'),
    )
    ids.select(line.alias("line")).write.mode("overwrite").parquet("/tmp/cdx_soak_lines")
    lines = spark.read.parquet("/tmp/cdx_soak_lines")
    lines.count()  # warm

    walls = []
    for _ in range(2):
        t0 = time.monotonic()
        parsed = cdx_lines(lines)
        n_ok = parsed.filter(~F.col("cdx_error")).count()
        walls.append(time.monotonic() - t0)
    print(f"cdx_lines parse: {N} lines in {min(walls):5.2f}s = "
          f"{N/min(walls):9.0f} lines/s (ok {n_ok})")

    walls = []
    for _ in range(2):
        t0 = time.monotonic()
        plan = plan_fetches(cdx_lines(lines), ["com,site7)", "com,site8)"])
        n_plan = plan.count()
        walls.append(time.monotonic() - t0)
    print(f"plan_fetches (2 of 200 domains, latest-only): {n_plan} fetches "
          f"in {min(walls):5.2f}s")

    # SURT over 1M messy URLs
    urls = spark.range(N).select(
        F.concat(
            F.lit("HTTP://WWW.Example"), F.pmod("id", F.lit(1000)).cast("string"),
            F.lit(".COM:80/Path/"), F.col("id").cast("string"),
            F.lit("?b=2&a=1&utm_source=x#frag"),
        ).alias("url")
    )
    urls.write.mode("overwrite").parquet("/tmp/cdx_soak_urls")
    urls = spark.read.parquet("/tmp/cdx_soak_urls")
    urls.count()
    walls = []
    for _ in range(2):
        t0 = time.monotonic()
        n = surt_key_col(urls).filter(F.col("urlkey").startswith("com,example")).count()
        walls.append(time.monotonic() - t0)
    print(f"surt_key_col: {N} urls in {min(walls):5.2f}s = "
          f"{N/min(walls):9.0f} urls/s (all reversed: {n == N})")
    spark.stop()


if __name__ == "__main__":
    main()
