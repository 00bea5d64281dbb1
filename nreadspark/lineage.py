"""Per-partition checkpointed lineage + resumable runs.

North-rule requirement: "resumable from checkpoint with per-partition lineage
+ metrics".  Mechanism:

* every document is deterministically assigned a **bucket** =
  ``pmod(xxhash64(doc_id), n_buckets)`` -- stable across runs and cluster
  sizes, so resume never depends on Spark partitioning;
* output parquet is written ``partitionBy("bucket")`` with dynamic partition
  overwrite, so re-running a bucket **replaces** any partial data from a
  crashed attempt (idempotent);
* after the write, one JSON **manifest** per bucket is committed atomically
  (tmp file + rename) under ``<output>/_lineage/`` with that bucket's metrics
  (docs in/out, extraction/fallback/retry/failure counts, bytes, kernel ms);
* resume = anti-join of the input against the set of committed manifests:
  only buckets without a manifest are recomputed.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, functions as F

from .pipeline import extract

LINEAGE_DIR = "_lineage"


def bucket_col(n_buckets: int, doc_id_col: str = "doc_id"):
    return F.pmod(F.xxhash64(doc_id_col), F.lit(n_buckets)).cast("int")


def completed_buckets(output_path: str) -> set[int]:
    lineage_path = os.path.join(output_path, LINEAGE_DIR)
    if not os.path.isdir(lineage_path):
        return set()
    done = set()
    for name in os.listdir(lineage_path):
        if name.startswith("bucket=") and name.endswith(".json"):
            try:
                done.add(int(name[len("bucket=") : -len(".json")]))
            except ValueError:
                continue
    return done


def _is_local_path(path: str) -> bool:
    return "://" not in path or path.startswith("file:")


def _hadoop_fs(spark, path_str: str):
    jvm = spark._jvm
    path = jvm.org.apache.hadoop.fs.Path(path_str)
    fs = path.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, path, jvm


def completed_buckets_fs(spark, output_path: str) -> set[int]:
    """completed_buckets over any Hadoop-compatible filesystem (hdfs://,
    s3a://, gs://, ...) via the JVM FileSystem API; local paths use the
    cheaper os.listdir."""
    if _is_local_path(output_path):
        return completed_buckets(output_path.removeprefix("file:"))
    fs, _, jvm = _hadoop_fs(spark, output_path)
    lineage = jvm.org.apache.hadoop.fs.Path(output_path + "/" + LINEAGE_DIR)
    if not fs.exists(lineage):
        return set()
    done = set()
    for status in fs.listStatus(lineage):
        name = status.getPath().getName()
        if name.startswith("bucket=") and name.endswith(".json"):
            try:
                done.add(int(name[len("bucket=") : -len(".json")]))
            except ValueError:
                continue
    return done


def write_marker(output_path: str, name: str, payload: dict, spark=None) -> None:
    """Atomically commit one JSON file under ``<output>/_lineage/<name>``
    (tmp file + rename -- atomic on local/HDFS, best-effort on object
    stores).  The commit unit of both per-bucket manifests and stage
    markers."""
    data = json.dumps(payload, sort_keys=True)
    if spark is None or _is_local_path(output_path):
        lineage_path = os.path.join(output_path.removeprefix("file:"), LINEAGE_DIR)
        os.makedirs(lineage_path, exist_ok=True)
        final = os.path.join(lineage_path, name)
        tmp = final + ".tmp"
        with open(tmp, "w", encoding="utf-8") as fh:
            fh.write(data)
            fh.flush()
            os.fsync(fh.fileno())
        os.replace(tmp, final)  # atomic commit
        return
    fs, _, jvm = _hadoop_fs(spark, output_path)
    Path = jvm.org.apache.hadoop.fs.Path
    final = Path(f"{output_path}/{LINEAGE_DIR}/{name}")
    tmp = Path(f"{output_path}/{LINEAGE_DIR}/.{name}.tmp")
    out = fs.create(tmp, True)
    try:
        out.write(bytearray(data, "utf-8"))
    finally:
        out.close()
    if fs.exists(final):
        fs.delete(final, False)
    fs.rename(tmp, final)


def read_marker(output_path: str, name: str, spark=None) -> dict | None:
    """Read a committed marker back, or None if it was never committed."""
    if spark is None or _is_local_path(output_path):
        path = os.path.join(output_path.removeprefix("file:"), LINEAGE_DIR, name)
        if not os.path.isfile(path):
            return None
        with open(path, encoding="utf-8") as fh:
            return json.load(fh)
    fs, _, jvm = _hadoop_fs(spark, output_path)
    path = jvm.org.apache.hadoop.fs.Path(f"{output_path}/{LINEAGE_DIR}/{name}")
    if not fs.exists(path):
        return None
    stream = fs.open(path)
    try:
        data = bytes(stream.readAllBytes())
    finally:
        stream.close()
    return json.loads(data.decode("utf-8"))


def _write_manifest(output_path: str, bucket: int, payload: dict, spark=None) -> None:
    write_marker(output_path, f"bucket={bucket}.json", payload, spark=spark)


def run_extraction(
    spark,
    input_df: DataFrame,
    output_path: str,
    n_buckets: int = 64,
    url_col: str | None = None,
    resume: bool = True,
    max_doc_bytes: int | None = None,
) -> dict:
    """Run (or resume) the extraction job with per-bucket lineage.

    ``max_doc_bytes`` is the per-document truncate-with-flag byte budget
    (pipeline.extract); truncation counts surface per bucket as
    ``docs_truncated`` in the manifests.

    Returns a run summary dict (buckets computed/skipped, doc counts, ms).
    """
    started = time.perf_counter()
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

    done = completed_buckets_fs(spark, output_path) if resume else set()
    df = input_df.withColumn("bucket", bucket_col(n_buckets))
    todo_df = df.filter(~F.col("bucket").isin(list(done))) if done else df

    extracted = extract(todo_df, url_col=url_col, max_doc_bytes=max_doc_bytes)
    # bucket is deterministic from doc_id: recompute on the output side so it
    # survives the mapInPandas schema boundary without widening the kernel IO
    extracted = extracted.withColumn("bucket", bucket_col(n_buckets))

    # persist the kernel output once: the write below and the per-bucket
    # manifest aggregation both read it, so the input is scanned ONCE and
    # the kernel runs ONCE -- no read-back of the just-committed parquet
    # (which at fleet scale is a second full pass over the output).  If an
    # executor loses cached blocks Spark recomputes just those partitions
    # deterministically, so manifests still describe exactly the committed
    # rows.
    from pyspark import StorageLevel

    extracted = extracted.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        (
            extracted.write.partitionBy("bucket")
            .mode("overwrite")
            .parquet(output_path)
        )
        stats = _bucket_stats(extracted)
    finally:
        extracted.unpersist()

    for row in stats:
        payload = row.asDict()
        payload["committed_at"] = time.time()
        _write_manifest(output_path, int(row["bucket"]), payload, spark=spark)

    return {
        "n_buckets": n_buckets,
        "buckets_skipped": len(done),
        "buckets_computed": len(stats),
        "docs_computed": int(sum(r["docs"] for r in stats)),
        "wall_ms": (time.perf_counter() - started) * 1000.0,
    }


def _bucket_stats(extracted: DataFrame):
    return (
        extracted.groupBy("bucket")
        .agg(
            F.count("*").alias("docs"),
            F.sum(F.col("content_extracted").cast("int")).alias("docs_extracted"),
            F.sum(F.col("metrics.fallback_rerun").cast("int")).alias("fallback_reruns"),
            F.sum(F.col("metrics.parse_retried").cast("int")).alias("parse_retries"),
            F.sum((F.col("metrics.n_candidates") < 0).cast("int")).alias("kernel_failures"),
            F.sum(F.col("metrics.truncated").cast("int")).alias("docs_truncated"),
            F.sum("metrics.in_bytes").alias("in_bytes"),
            F.sum("metrics.ms").alias("kernel_ms"),
            F.max("metrics.ms").alias("max_doc_ms"),
        )
        .collect()
    )
