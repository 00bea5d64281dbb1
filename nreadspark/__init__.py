"""nreadspark: PySpark-native main-content extraction engine.

A from-scratch, Spark-first reimplementation of the capabilities of
marek-stoj/NReadability (Arc90 readability): boilerplate stripping, DOM
heuristics scoring, top-candidate selection and cleaning -- vectorized over an
Iceberg/parquet table of interleaved text+media documents via Arrow-native
``mapInArrow`` kernels, with skew-aware partitioning and per-partition
checkpointed lineage for resumability.  Optional surfaces: multi-page
assembly (multipage), XHTML debug sink (serialize), Structured Streaming
wrapper (streaming).
"""

from .kernel import (
    Options,
    ReadingMargin,
    ReadingSize,
    ReadingStyle,
    TranscodeResult,
    transcode,
)
from .multipage import assemble_pages, transcode_web
from .pdf import extract_pdf_document, make_pdf
from .serialize import SerializationParams, serialize_document, transcode_to_html
from .spans import extract_spans, flatten_spans_text, spans_to_html

__version__ = "0.1.0"

__all__ = [
    "Options",
    "ReadingStyle",
    "ReadingMargin",
    "ReadingSize",
    "SerializationParams",
    "TranscodeResult",
    "transcode",
    "extract_spans",
    "flatten_spans_text",
    "spans_to_html",
    "extract_document",
    "assemble_pages",
    "transcode_web",
    "serialize_document",
    "transcode_to_html",
    "extract_pdf_document",
    "make_pdf",
]


def extract_document(html: str, url: str | None = None, opts: Options | None = None) -> dict:
    """Convenience one-document API: html -> {spans, title, content_extracted,
    next_page_url, metrics}."""
    result = transcode(html, url, opts)
    return {
        "spans": extract_spans(result.article_content),
        "title": result.title,
        "content_extracted": result.content_extracted,
        "next_page_url": result.next_page_url,
        "metrics": result.metrics,
    }
