"""Spark surface: vectorized extraction over the interleaved-documents table.

Design (Spark-first, not a port of the reference's single-document loop):

* **HTML reassembly stays in the JVM.**  Spans are sorted and concatenated
  with built-in higher-order functions (``array_sort`` + ``transform`` +
  ``concat_ws``) inside whole-stage codegen -- only ``(doc_id, html[, url])``
  crosses the Arrow boundary, never the span structs.
* **The kernel runs in Arrow-batched ``mapInPandas``** (no per-row Python
  UDFs): one Python worker processes a whole record batch per call; regexes
  are compiled once per worker at module import.
* **Skew**: mega-documents (FIXTURES.md `mega_doc` family, reference corpus
  max 448KB) are defused by (a) hashing docs uniformly across many more
  partitions than cores (`repartition_for_extraction`), and (b) capping the
  Arrow batch size so a single huge batch cannot monopolize a worker --
  set ``spark.sql.execution.arrow.maxRecordsPerBatch`` (64 is a good
  default for web-page-sized docs).
* At cluster scale the same plan runs unchanged: the shuffle key is
  ``xxhash64(doc_id)`` (uniform, deterministic), AQE coalesces small
  partitions, and lineage bucketing (lineage.py) gives idempotent resume.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

SPAN_TYPE = StructType(
    [
        StructField("kind", StringType()),
        StructField("text", StringType()),
        StructField("media_ref", StringType()),
        StructField("offset", IntegerType()),
    ]
)

METRICS_TYPE = StructType(
    [
        StructField("n_candidates", IntegerType()),
        StructField("top_score", DoubleType()),
        StructField("fallback_rerun", BooleanType()),
        StructField("parse_retried", BooleanType()),
        StructField("in_bytes", LongType()),
        StructField("ms", DoubleType()),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("spans", ArrayType(SPAN_TYPE)),
        StructField("title", StringType()),
        StructField("content_extracted", BooleanType()),
        StructField("next_page_url", StringType()),
        StructField("metrics", METRICS_TYPE),
    ]
)

# JVM-side span -> HTML reassembly (codegen'd; no Python involved)
_HTML_FROM_SPANS_SQL = """
concat_ws('',
  transform(
    array_sort({spans}, (l, r) -> int(sign(l.offset - r.offset))),
    s -> CASE
           WHEN s.kind = 'text'  THEN coalesce(s.text, '')
           WHEN s.kind = 'image' THEN concat('<img src="', coalesce(s.media_ref, ''), '" />')
           ELSE concat('<embed src="', coalesce(s.media_ref, ''), '" />')
         END))
"""


def html_from_spans_col(spans_col: str = "spans"):
    """Column expression reassembling a document's HTML from its spans."""
    return F.expr(_HTML_FROM_SPANS_SQL.format(spans=spans_col))


def repartition_for_extraction(df: DataFrame, num_partitions: int | None = None) -> DataFrame:
    """Uniform deterministic spread on xxhash64(doc_id).  Use ~4x the core
    count so the mega-doc tail averages out across task waves instead of
    serializing behind one straggler."""
    if num_partitions is None:
        sc = df.sparkSession.sparkContext
        num_partitions = max(sc.defaultParallelism * 4, 8)
    return df.repartition(num_partitions, F.xxhash64("doc_id"))


def _extract_batches(iterator):
    """mapInPandas kernel: (doc_id, __html[, __url]) -> OUTPUT_SCHEMA rows."""
    import pandas as pd

    from .kernel import Options, transcode
    from .spans import extract_spans

    opts = Options()
    for pdf in iterator:
        n = len(pdf)
        doc_ids = pdf["doc_id"].tolist()
        htmls = pdf["__html"].tolist()
        urls = pdf["__url"].tolist() if "__url" in pdf.columns else [None] * n

        out = {
            "doc_id": doc_ids,
            "spans": [None] * n,
            "title": [None] * n,
            "content_extracted": [False] * n,
            "next_page_url": [None] * n,
            "metrics": [None] * n,
        }
        for i in range(n):
            html = htmls[i]
            started = time.perf_counter()
            if html is None or html.strip() == "":
                out["spans"][i] = []
                out["metrics"][i] = {
                    "n_candidates": 0,
                    "top_score": 0.0,
                    "fallback_rerun": False,
                    "parse_retried": False,
                    "in_bytes": 0,
                    "ms": (time.perf_counter() - started) * 1000.0,
                }
                continue
            try:
                result = transcode(html, urls[i], opts)
                out["spans"][i] = extract_spans(result.article_content)
                out["title"][i] = result.title
                out["content_extracted"][i] = result.content_extracted
                out["next_page_url"][i] = result.next_page_url
                m = result.metrics
                out["metrics"][i] = {
                    "n_candidates": int(m.get("n_candidates", 0)),
                    "top_score": float(m.get("top_score", 0.0)),
                    "fallback_rerun": bool(m.get("fallback_rerun", False)),
                    "parse_retried": bool(m.get("parse_retried", False)),
                    "in_bytes": int(m.get("in_bytes", 0)),
                    "ms": float(m.get("ms", 0.0)),
                }
            except Exception:
                # a poisoned document must never kill a 10^12-doc job: emit an
                # empty, clearly-flagged row instead (content_extracted=False,
                # n_candidates=-1 marks kernel failure for the lineage metrics)
                out["spans"][i] = []
                out["metrics"][i] = {
                    "n_candidates": -1,
                    "top_score": 0.0,
                    "fallback_rerun": False,
                    "parse_retried": False,
                    "in_bytes": len(html.encode("utf-8", errors="replace")),
                    "ms": (time.perf_counter() - started) * 1000.0,
                }
        yield pd.DataFrame(out)


def extract(
    df: DataFrame,
    url_col: str | None = None,
    spans_col: str = "spans",
    repartition: bool = False,
    num_partitions: int | None = None,
) -> DataFrame:
    """Extract main content for every document of an interleaved-spans table.

    Input:  (doc_id string, spans array<struct<kind,text,media_ref,offset>>
             [, url string])
    Output: OUTPUT_SCHEMA (doc_id, spans, title, content_extracted,
            next_page_url, metrics)
    """
    cols = [F.col("doc_id"), html_from_spans_col(spans_col).alias("__html")]
    if url_col:
        cols.append(F.col(url_col).alias("__url"))
    prepared = df.select(*cols)
    if repartition:
        prepared = repartition_for_extraction(prepared, num_partitions)
    return prepared.mapInPandas(_extract_batches, OUTPUT_SCHEMA)


def extract_from_html(df: DataFrame, html_col: str = "html", url_col: str | None = None) -> DataFrame:
    """Same kernel over a plain (doc_id, html[, url]) table."""
    cols = [F.col("doc_id"), F.col(html_col).alias("__html")]
    if url_col:
        cols.append(F.col(url_col).alias("__url"))
    return df.select(*cols).mapInPandas(_extract_batches, OUTPUT_SCHEMA)


def configure_session_defaults(builder):
    """Recommended session config for the extraction workload."""
    return (
        builder.config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "64")
        .config("spark.sql.adaptive.enabled", "true")
    )
