"""Multimodal column plumbing: images/audio/video as opaque binary columns
with typed metadata, processed through Arrow-batched ``mapInPandas`` kernels.

The actual codec work (PIL/ffmpeg/librosa) is NOT available in this
environment, so the decode step is STUBBED: ``decode_image_stub`` produces a
deterministic fake decode derived from the bytes; ``decode_image_real``
raises ``NotImplementedError`` unless the libs import.  What IS real and
tested: the Spark-side schema, batching shape, partitioning and UDF
signatures -- swap the stub for a real decoder and nothing else changes.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_ref", StringType()),
        StructField("media_kind", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", IntegerType()),
    ]
)

FEATURES_SCHEMA = StructType(
    [
        StructField("media_ref", StringType()),
        StructField("media_kind", StringType()),
        StructField("n_bytes", LongType()),
        StructField("sha256", StringType()),
        StructField("features", ArrayType(DoubleType())),
        StructField("decoder", StringType()),
    ]
)


def synthesize_media_df(spark, docs_df: DataFrame) -> DataFrame:
    """Build a deterministic fake media table from doc ids: payload bytes are
    a hash expansion of the ref (real binary column, real sizes)."""
    return docs_df.select(
        F.concat(F.lit("img://"), F.col("doc_id").cast("string")).alias("media_ref"),
        F.lit("image").alias("media_kind"),
        F.encode(
            F.repeat(F.sha2(F.col("doc_id").cast("string"), 256), 8), "utf-8"
        ).cast("binary").alias("payload"),
        (F.pmod(F.xxhash64("doc_id"), F.lit(1920)) + 32).cast("int").alias("width"),
        (F.pmod(F.xxhash64("doc_id", F.lit(1)), F.lit(1080)) + 32).cast("int").alias("height"),
        F.lit(0).cast("int").alias("duration_ms"),
    )


def _fake_features(payload: bytes, n: int = 8) -> list[float]:
    """Deterministic stand-in for a decoded-image feature vector."""
    digest = hashlib.sha256(payload or b"").digest()
    return [int.from_bytes(digest[i * 4 : i * 4 + 4], "big") / 2**32 for i in range(n)]


def decode_image_real(payload: bytes):  # pragma: no cover - env has no PIL
    """Real decoder seam.  Raises in this container (no imaging libs)."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "image decoding requires PIL/pillow, unavailable in this environment; "
            "use the deterministic stub path (decoder='stub') instead"
        ) from exc
    raise NotImplementedError("real decode path not wired yet")


def extract_media_features(media_df: DataFrame, use_stub: bool = True) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.  The batch
    shape is the real one a decoder would see: an iterator of pandas frames
    whose `payload` column holds raw bytes."""

    def batches(iterator):
        import pandas as pd

        for pdf in iterator:
            payloads = pdf["payload"].tolist()
            feats, hashes, nbytes = [], [], []
            for p in payloads:
                raw = bytes(p) if p is not None else b""
                nbytes.append(len(raw))
                hashes.append(hashlib.sha256(raw).hexdigest())
                if use_stub:
                    feats.append(_fake_features(raw))
                else:  # pragma: no cover
                    feats.append(decode_image_real(raw))
            yield pd.DataFrame(
                {
                    "media_ref": pdf["media_ref"],
                    "media_kind": pdf["media_kind"],
                    "n_bytes": nbytes,
                    "sha256": hashes,
                    "features": feats,
                    "decoder": "stub" if use_stub else "real",
                }
            )

    cols = ["media_ref", "media_kind", "payload"]
    return media_df.select(*cols).mapInPandas(batches, FEATURES_SCHEMA)


def media_stats(media_df: DataFrame) -> DataFrame:
    """JVM-side metadata aggregation (no decode): per kind, byte/size stats."""
    return media_df.groupBy("media_kind").agg(
        F.count("*").cast("bigint").alias("n_media"),
        F.sum(F.length("payload")).cast("bigint").alias("total_bytes"),
        F.round(F.avg("width"), 2).alias("avg_width"),
        F.round(F.avg("height"), 2).alias("avg_height"),
    )
