#!/usr/bin/env python
"""Benchmark harness (driver contract).

Default mode: run the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
``/root/testdata/sf0.1``) on ``local[$SPARK_GRAFT_CPUS]`` and print ONE JSON
line ``{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}``.

The extraction headline runs over the deterministic synthetic interleaved
corpus (nreadspark.corpus — seed-fixed, generated on executors, no external
data) because the north-rule metric is *documents extracted/sec*; relational
queries run over the driver-generated sf tables.

``--scaling`` mode: re-invoke this script at two parallelism levels
(local[8] vs local[32] — the sandbox stand-in for N and 4N executors) on the
SAME synthetic input and report throughput at both plus scaling efficiency
``(T_4N / T_N) / 4``; results are appended to BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
# extraction corpus size: seed-fixed, includes the mega-doc skew tail
N_DOCS = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "6000"))


def _session(cpus: int):
    from pyspark.sql import SparkSession

    from nreadspark.pipeline import configure_session_defaults

    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"nreadspark-bench-{cpus}")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    return configure_session_defaults(builder).getOrCreate()


def _force(df) -> int:
    """Fully execute a plan without collecting rows to the driver."""
    df.write.format("noop").mode("overwrite").save()
    return 0


def _timed(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def bench_queries(spark, sf_dir: str) -> dict[str, float]:
    """Headline battery: flagship extraction + the widest relational ops."""
    import __spark_entry__ as entry_mod

    from nreadspark.corpus import build_corpus_df
    from nreadspark.pipeline import extract

    timings: dict[str, float] = {}

    # --- flagship: synthetic interleaved corpus -> span extraction ---------
    corpus = build_corpus_df(spark, N_DOCS)
    timings["extract_synthetic"] = _timed(
        lambda: _force(extract(corpus, repartition=True))
    )

    # --- the driver-contract battery over the sf tables --------------------
    qs = entry_mod.queries()
    headline = [
        "extract_interleaved",
        "dedup_exact",
        "dedup_minhash_lsh",
        "dedup_simhash",
        "dedup_embedding_cosine",
        "ann_bruteforce_topk",
        "ann_lsh_topk",
        "text_token_count",
        "text_quality",
        "text_lang_id",
        "tpch_q1_like",
        "join_revenue_by_segment",
        "events_daily",
        "events_top_per_type",
    ]
    for name in headline:
        fn = qs[name]
        timings[name] = _timed(lambda fn=fn: _force(fn(spark, sf_dir)))
    return timings


def run_single() -> dict:
    spark = _session(CPUS)
    try:
        # warm the JVM + Python workers once so timings measure steady state
        spark.range(1000).selectExpr("sum(id)").collect()
        timings = bench_queries(spark, SF_DIR)
    finally:
        spark.stop()
    total = sum(timings.values())
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    return {
        "metric": "total_bench_wall_sec",
        "value": round(total, 3),
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in timings.items()},
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "cpus": CPUS,
        "extract_docs": N_DOCS,
        "extract_docs_per_sec": round(N_DOCS / timings["extract_synthetic"], 2),
    }


# ---------------------------------------------------------------------------
# scaling mode: same input, two parallelism levels
# ---------------------------------------------------------------------------


def run_extract_only() -> dict:
    """Extraction-only timing used by --scaling child processes."""
    from nreadspark.corpus import build_corpus_df
    from nreadspark.pipeline import extract

    spark = _session(CPUS)
    try:
        spark.range(1000).selectExpr("sum(id)").collect()
        corpus = build_corpus_df(spark, N_DOCS)
        # warm-up run (JIT, Python worker fork, code paths), then 2 timed runs
        _force(extract(corpus, repartition=True))
        runs = [_timed(lambda: _force(extract(corpus, repartition=True))) for _ in range(2)]
    finally:
        spark.stop()
    best = min(runs)
    return {
        "cpus": CPUS,
        "n_docs": N_DOCS,
        "runs_sec": [round(r, 3) for r in runs],
        "best_sec": round(best, 3),
        "docs_per_sec": round(N_DOCS / best, 2),
        "docs_per_sec_per_core": round(N_DOCS / best / CPUS, 2),
    }


def run_scaling(levels=(8, 32)) -> dict:
    results = []
    for cpus in levels:
        env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus))
        out = subprocess.run(
            [sys.executable, __file__, "--extract-only"],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        )
        line = [ln for ln in out.stdout.strip().splitlines() if ln.startswith("{")][-1]
        results.append(json.loads(line))
    t_n, t_4n = results[0], results[-1]
    ratio = t_4n["docs_per_sec"] / t_n["docs_per_sec"]
    factor = t_4n["cpus"] / t_n["cpus"]
    return {
        "levels": results,
        "throughput_ratio": round(ratio, 3),
        "core_factor": factor,
        "scaling_efficiency": round(ratio / factor, 3),
    }


def main() -> None:
    if "--extract-only" in sys.argv:
        print(json.dumps(run_extract_only()))
        return
    if "--scaling" in sys.argv:
        report = run_scaling()
        print(json.dumps(report, indent=2))
        return
    print(json.dumps(run_single()))


if __name__ == "__main__":
    main()
