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
    a hash expansion of the ref (real binary column, real sizes).  Every 5th
    row is a 'video' with a duration so the frame-sampling plumbing has
    input."""
    is_video = F.pmod("doc_id", F.lit(5)) == 0
    return docs_df.select(
        F.concat(
            F.when(is_video, F.lit("vid://")).otherwise(F.lit("img://")),
            F.col("doc_id").cast("string"),
        ).alias("media_ref"),
        F.when(is_video, F.lit("video")).otherwise(F.lit("image")).alias("media_kind"),
        F.encode(
            F.repeat(F.sha2(F.col("doc_id").cast("string"), 256), 8), "utf-8"
        ).cast("binary").alias("payload"),
        (F.pmod(F.xxhash64("doc_id"), F.lit(1920)) + 32).cast("int").alias("width"),
        (F.pmod(F.xxhash64("doc_id", F.lit(1)), F.lit(1080)) + 32).cast("int").alias("height"),
        F.when(is_video, (F.pmod(F.xxhash64("doc_id", F.lit(2)), F.lit(30000)) + 1000).cast("int"))
        .otherwise(F.lit(0).cast("int"))
        .alias("duration_ms"),
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


def resize_images(media_df: DataFrame, target_w: int, target_h: int, use_stub: bool = True) -> DataFrame:
    """Resize plumbing: binary-in/binary-out Arrow-batched kernel with
    updated size metadata.  The stub 'resize' deterministically re-derives a
    payload whose length scales with the target pixel count -- the schema,
    batch shape and metadata flow are exactly what a PIL `Image.resize`
    kernel needs; only the inner function swaps."""
    out_schema = StructType(
        [
            StructField("media_ref", StringType()),
            StructField("media_kind", StringType()),
            StructField("payload", BinaryType()),
            StructField("width", IntegerType()),
            StructField("height", IntegerType()),
        ]
    )

    def batches(iterator):
        import pandas as pd

        target_len = max(16, (target_w * target_h) // 256)
        for pdf in iterator:
            payloads = []
            for p in pdf["payload"].tolist():
                raw = bytes(p) if p is not None else b""
                if use_stub:
                    digest = hashlib.sha256(raw + b"resize").digest()
                    payloads.append((digest * (target_len // len(digest) + 1))[:target_len])
                else:  # pragma: no cover
                    payloads.append(decode_image_real(raw))
            yield pd.DataFrame(
                {
                    "media_ref": pdf["media_ref"],
                    "media_kind": pdf["media_kind"],
                    "payload": payloads,
                    "width": target_w,
                    "height": target_h,
                }
            )

    return media_df.select("media_ref", "media_kind", "payload").mapInPandas(
        batches, out_schema
    )


FRAME_SCHEMA = StructType(
    [
        StructField("media_ref", StringType()),
        StructField("frame_idx", IntegerType()),
        StructField("ts_ms", IntegerType()),
        StructField("frame_payload", BinaryType()),
    ]
)


def sample_video_frames(media_df: DataFrame, every_ms: int = 1000, max_frames: int = 32) -> DataFrame:
    """Frame-sampling plumbing: the 1->N row expansion an ffmpeg keyframe
    sampler produces, as an Arrow-batched kernel (stubbed frame bytes).
    Non-video rows emit nothing; output row count is
    min(duration_ms // every_ms + 1, max_frames) per video."""

    def batches(iterator):
        import pandas as pd

        for pdf in iterator:
            refs, idxs, tss, frames = [], [], [], []
            for ref, kind, payload, dur in zip(
                pdf["media_ref"], pdf["media_kind"], pdf["payload"], pdf["duration_ms"]
            ):
                if kind != "video" or not dur:
                    continue
                raw = bytes(payload) if payload is not None else b""
                n = min(int(dur) // every_ms + 1, max_frames)
                for i in range(n):
                    refs.append(ref)
                    idxs.append(i)
                    tss.append(i * every_ms)
                    frames.append(hashlib.sha256(raw + i.to_bytes(4, "big")).digest())
            yield pd.DataFrame(
                {"media_ref": refs, "frame_idx": idxs, "ts_ms": tss, "frame_payload": frames}
            )

    cols = ["media_ref", "media_kind", "payload", "duration_ms"]
    return media_df.select(*cols).mapInPandas(batches, FRAME_SCHEMA)


def media_stats(media_df: DataFrame) -> DataFrame:
    """JVM-side metadata aggregation (no decode): per kind, byte/size stats."""
    return media_df.groupBy("media_kind").agg(
        F.count("*").cast("bigint").alias("n_media"),
        F.sum(F.length("payload")).cast("bigint").alias("total_bytes"),
        F.round(F.avg("width"), 2).alias("avg_width"),
        F.round(F.avg("height"), 2).alias("avg_height"),
    )
