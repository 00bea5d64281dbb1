"""Training-text rendering of interleaved span documents -- the sink that
turns the engine's primary output (the north-rule ``spans`` column:
``array<struct<kind,text,media_ref,offset>>``) into the flat text-with-
media-sentinels format multimodal LLM pipelines train on (text chunks
interleaved with ``<|image|>``-style placeholders, as in the public
Flamingo / interleaved-corpus recipes).

One whole-stage-codegen projection: ``array_sort`` by offset (span order
is the semantic payload -- never trust input ordering), ``transform`` to
per-span text, ``filter`` empties, ``array_join``.  No Python, no
shuffle; at 100 TB this renders inside the scan stage of the shard
writer, composing directly with ``ops.chunking.pack_shards``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def render_span_col(span, media_format: str = "<|{kind}|>", include_ref: bool = False) -> Column:
    """One span -> its rendered text: text spans contribute their text,
    media spans a sentinel built from ``media_format`` (``{kind}`` is
    substituted JVM-side; ``include_ref=True`` appends ``:<media_ref>``
    inside the sentinel so a loader can resolve the asset)."""
    if "{kind}" not in media_format:
        raise ValueError("media_format must contain '{kind}'")
    pre, post = media_format.split("{kind}", 1)
    sentinel_body = (
        F.concat_ws(":", span["kind"], span["media_ref"])
        if include_ref
        else span["kind"]
    )
    sentinel = F.concat(F.lit(pre), sentinel_body, F.lit(post))
    return F.when(span["kind"] == "text", F.coalesce(span["text"], F.lit(""))).otherwise(
        sentinel
    )


def spans_to_training_text(
    df: DataFrame,
    spans_col: str = "spans",
    separator: str = "\n\n",
    media_format: str = "<|{kind}|>",
    include_ref: bool = False,
) -> DataFrame:
    """(doc_id, text, n_text_spans, n_media_spans): flatten interleaved
    spans into training text.  Spans render in OFFSET order (explicitly
    sorted -- a shuffled or re-read spans column must produce the same
    text); text spans that render empty are dropped from the join so
    separators never double up; NULL spans arrays yield empty text with
    zero counts."""
    spans = F.col(spans_col)
    ordered = F.array_sort(
        spans,
        lambda a, b: F.when(a["offset"] < b["offset"], -1)
        .when(a["offset"] > b["offset"], 1)
        .otherwise(0),
    )
    rendered = F.transform(
        ordered, lambda s: render_span_col(s, media_format, include_ref)
    )
    text = F.array_join(F.filter(rendered, lambda t: F.length(t) > 0), separator)
    n_text = F.size(F.filter(spans, lambda s: s["kind"] == "text"))
    n_media = F.size(F.filter(spans, lambda s: s["kind"] != "text"))
    return df.select(
        "doc_id",
        F.coalesce(text, F.lit("")).alias("text"),
        F.greatest(n_text, F.lit(0)).cast("bigint").alias("n_text_spans"),
        F.greatest(n_media, F.lit(0)).cast("bigint").alias("n_media_spans"),
    )
