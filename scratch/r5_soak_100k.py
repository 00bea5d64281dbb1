"""Round-5 operator soak at 100k+ scale on local[32]: decontamination,
semantic dedup and URL dedup with planted ground truth -- wall-clock +
exact recall/precision recorded for BENCH/COVERAGE evidence.

Usage: python scratch/r5_soak_100k.py
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ.setdefault("PYSPARK_SUBMIT_ARGS", "--driver-memory 8g pyspark-shell")


def timed(fn):
    t0 = time.perf_counter()
    out = fn()
    return out, round(time.perf_counter() - t0, 2)


def main() -> None:
    from pyspark.sql import SparkSession, functions as F

    import bench as bench_mod

    spark = bench_mod._session(32)
    spark.range(1000).selectExpr("sum(id)").collect()
    report = {}

    # -- 1. decontaminate: 100k docs, 1k-doc eval set, 5% planted leak ----
    from nreadspark.ops.dedup import decontaminate, release_caches

    leak = "the held out benchmark sentence alpha beta gamma delta epsilon zeta"
    words = F.transform(
        F.sequence(F.lit(1), F.lit(50)),
        lambda i: F.concat(F.lit("w"), F.pmod(F.xxhash64(F.col("id") * 97 + i), F.lit(50000)).cast("string")),
    )
    docs = spark.range(100_000).select(
        F.col("id").alias("doc_id"),
        F.when(
            F.pmod("id", F.lit(20)) == 3,
            F.concat(F.concat_ws(" ", words), F.lit(" " + leak)),
        ).otherwise(F.concat_ws(" ", words)).alias("text"),
    ).localCheckpoint()  # materialize: soak times the operator, not the generator
    eval_df = spark.createDataFrame(
        [("e1", f"q: {leak} a: yes"), ("e2", "unrelated benchmark prompt text entirely")],
        "eval_id string, text string",
    )
    flagged, secs = timed(
        lambda: decontaminate(docs, eval_df, n=8)
        .filter("contaminated")
        .agg(F.count("*"), F.min("doc_id"), F.max("doc_id"))
        .collect()[0]
    )
    n_flagged = flagged[0]
    report["decontaminate_100k"] = {
        "wall_s": secs,
        "flagged": n_flagged,
        "expected": 5000,
        "exact": n_flagged == 5000 and flagged[1] == 3 and flagged[2] == 99983,
    }

    # -- 2. dedup_semantic: 100k vectors in 64 clusters + 2k planted dups -
    import pyarrow as pa

    from nreadspark.ops.dedup import dedup_semantic

    def gen(iterator):
        import numpy as np

        for batch in iterator:
            ids = batch.column(0).to_pylist()
            rng = np.random.RandomState(ids[0] % (2**31))
            cents = np.random.RandomState(7).randn(64, 64)
            cents /= np.linalg.norm(cents, axis=1, keepdims=True)
            out = []
            for i in ids:
                if i >= 100_000:  # planted duplicate of i-100000
                    base = np.random.RandomState((i - 100_000) % (2**31 - 1) + 1).randn(64) * 0.25
                    v = cents[(i - 100_000) % 64] + base
                else:
                    base = np.random.RandomState(i % (2**31 - 1) + 1).randn(64) * 0.25
                    v = cents[i % 64] + base
                out.append([float(x) for x in v])
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids, pa.int64()), pa.array(out, pa.list_(pa.float64()))],
                names=["vec_id", "embedding"],
            )

    base_ids = spark.range(100_000)
    dup_ids = spark.range(100_000, 102_000)
    emb = (
        base_ids.union(dup_ids)
        .repartition(32)
        .mapInArrow(gen, "vec_id long, embedding array<double>")
        .localCheckpoint()
    )
    pairs, secs = timed(
        lambda: dedup_semantic(emb, dim=64, n_lists=64, threshold=0.999)
        .agg(F.count("*"), F.sum((F.col("id_b") - F.col("id_a") == 100_000).cast("int")))
        .collect()[0]
    )
    release_caches()
    report["dedup_semantic_102k"] = {
        "wall_s": secs,
        "pairs": pairs[0],
        "planted_recovered": pairs[1],
        "expected_planted": 2000,
        "recall": round((pairs[1] or 0) / 2000, 4),
    }

    # -- 3. dedup_by_url: 1M messy URLs -> 100k canonical groups ----------
    from nreadspark.ops.urls import dedup_by_url

    g = F.pmod("id", F.lit(100_000)).cast("string")
    url = F.concat(
        F.when(F.pmod("id", F.lit(2)) == 0, "HTTP").otherwise("http"),
        F.lit("://"),
        F.when(F.pmod("id", F.lit(4)) == 0, F.concat(F.lit("WWW.S"), g, F.lit(".COM")))
        .otherwise(F.concat(F.lit("www.s"), g, F.lit(".com"))),
        F.when(F.pmod("id", F.lit(3)) == 0, ":80").otherwise(""),
        F.lit("/p/"), g,
        F.when(F.pmod("id", F.lit(5)) == 0, "/").otherwise(""),
        F.when(F.pmod("id", F.lit(2)) == 0, F.concat(F.lit("?a=1&id="), g))
        .otherwise(F.concat(F.lit("?id="), g, F.lit("&a=1&utm_source=x"))),
        F.when(F.pmod("id", F.lit(7)) == 0, "#frag").otherwise(""),
    )
    urls = spark.range(1_000_000).select(F.col("id").alias("doc_id"), url.alias("url")).localCheckpoint()
    res, secs = timed(
        lambda: dedup_by_url(urls)
        .agg(F.count("*"), F.min("n_docs"), F.max("n_docs"))
        .collect()[0]
    )
    report["dedup_url_1m"] = {
        "wall_s": secs,
        "groups": res[0],
        "min_group": res[1],
        "max_group": res[2],
        "exact": res[0] == 100_000 and res[1] == 10 and res[2] == 10,
    }

    print(json.dumps(report, indent=2))
    spark.stop()


if __name__ == "__main__":
    main()
