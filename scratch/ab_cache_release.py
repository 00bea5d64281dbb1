"""Same-window interleaved A/B: the r3 bench loop (NO release_caches during
the battery -- persisted intermediates accumulate across queries) vs the r4
loop (release_caches() after each query's timed pair), same binary, same
session config, alternating rounds inside one window.

Adjudicates VERDICT r4 finding #1: is dedup_embedding_lsh's recorded 2.06x
r4-vs-r3 slowdown host weather, the cache-release bench change, or a code
regression?  Within one window the two loop styles differ ONLY in the
release call, so any systematic A-vs-B gap is the cache-release cost; if
both styles agree and sit near the r3 absolute, the recorded gap was
weather.

Usage: python scratch/ab_cache_release.py [rounds]   (default 3)
Prints one JSON line per (round, variant) plus a summary table.
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROUNDS = int(sys.argv[1]) if len(sys.argv) > 1 else 3

# the battery slice where persisted intermediates exist at all (dedup/ANN
# cluster) plus two pure-JVM controls that never touch the cache registry --
# if the CONTROLS move between rounds, the window is weathered and the
# round is labeled accordingly
QUERIES = [
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_ngram_substring",
    "dedup_simhash",
    "dedup_embedding_cosine",
    "dedup_embedding_lsh",
    "dedup_components",
    "ann_bruteforce_topk",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "events_daily",      # control: pure JVM, no registry use
    "tpch_q1_like",      # control
]


def main() -> None:
    import bench as bench_mod
    import __spark_entry__ as entry_mod

    from nreadspark.ops.dedup import release_caches

    spark = bench_mod._session(bench_mod.CPUS)
    spark.range(1000).selectExpr("sum(id)").collect()
    qs = entry_mod.queries()

    def battery(style: str) -> dict[str, float]:
        # clean slate so variant A's accumulated caches never leak into B
        release_caches()
        spark.catalog.clearCache()
        timings = {}
        for name in QUERIES:
            fn = qs[name]
            runs = [
                bench_mod._timed(lambda fn=fn: bench_mod._force(fn(spark, SF_DIR)))
                for _ in range(2)
            ]
            timings[name] = round(min(runs), 3)
            if style == "r4":
                release_caches()
        if style == "r3":
            release_caches()  # post-battery cleanup only (r3 had none at all)
        return timings

    history = []
    for rnd in range(ROUNDS):
        for style in ("r3", "r4"):
            t0 = time.perf_counter()
            timings = battery(style)
            rec = {
                "round": rnd,
                "style": style,
                "battery_sec": round(time.perf_counter() - t0, 2),
                "queries": timings,
            }
            history.append(rec)
            print(json.dumps(rec), flush=True)

    # summary: per query, best across rounds per style
    best = {"r3": {}, "r4": {}}
    for rec in history:
        for q, t in rec["queries"].items():
            cur = best[rec["style"]].get(q)
            best[rec["style"]][q] = t if cur is None else min(cur, t)
    print("\nquery                         best_r3loop  best_r4loop  r4/r3")
    for q in QUERIES:
        a, b = best["r3"][q], best["r4"][q]
        print(f"{q:28s}  {a:10.3f}  {b:10.3f}  {b / a:6.3f}")
    spark.stop()


if __name__ == "__main__":
    main()
