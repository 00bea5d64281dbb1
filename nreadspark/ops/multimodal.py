"""Multimodal column plumbing: images/audio/video as opaque binary columns
with typed metadata, processed through Arrow-batched ``mapInPandas`` kernels.

Decode strategy (three tiers, best available wins):

1. **PIL pixel decode** -- real decompression, gated behind an import guard
   (``pillow`` is not in this container; the seam is ``decode_image_real``).
2. **Header parse** -- a real, spec-compliant stdlib parser for PNG / GIF /
   JPEG container headers (``parse_image_header``): signature check + width/
   height extraction.  This runs everywhere and is what a 100 TB metadata
   sweep would use anyway (full decode of every image is rarely the goal).
3. **Stub** -- deterministic sha256-derived fake features for payloads no
   parser understands (e.g. the synthetic video containers).

The synthetic media table (``synthesize_media_df``) builds payloads from hex
strings entirely JVM-side (``unhex`` over concat/repeat), with structurally
valid PNG signatures+IHDR for images -- so the header parser exercises the
real code path AND an external SQL engine can reconstruct the exact bytes
(and their md5) for correctness oracles.
"""

from __future__ import annotations

import hashlib
import struct

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
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
        StructField("payload_md5", StringType()),  # md5 of the lowercase hex
        StructField("decoded_width", IntegerType()),
        StructField("decoded_height", IntegerType()),
        StructField("decoder", StringType()),
        StructField("features", ArrayType(DoubleType())),
    ]
)

_PNG_SIG_HEX = "89504e470d0a1a0a"
_PNG_IHDR_PRE_HEX = "0000000d49484452"  # IHDR length + type
_PNG_IHDR_POST_HEX = "0806000000" + "00000000"  # depth/color/etc + CRC field
_MP4_FTYP_HEX = "000000186674797069736f6d"  # '....ftypisom'


def _hex8(col):
    return F.lpad(F.lower(F.hex(col)), 8, "0")


def synthesize_media_df(spark, docs_df: DataFrame) -> DataFrame:
    """Deterministic fake media table from doc ids, built JVM-side from hex.

    Images are structurally valid PNG prefixes (signature + IHDR carrying
    the real width/height big-endian) + a repeated filler; every 5th row is
    a 'video' with an MP4 ftyp box prefix and a duration.  All fields are
    closed-form in doc_id, so DuckDB can rebuild the exact hex/md5."""
    is_video = F.pmod("doc_id", F.lit(5)) == 0
    width = (F.pmod("doc_id", F.lit(1889)) + 32).cast("int")
    height = (F.pmod("doc_id", F.lit(1049)) + 32).cast("int")
    filler = F.repeat(F.lit("abcdef"), (F.pmod("doc_id", F.lit(50)) + 1).cast("int"))
    png_hex = F.concat(
        F.lit(_PNG_SIG_HEX + _PNG_IHDR_PRE_HEX),
        _hex8(width),
        _hex8(height),
        F.lit(_PNG_IHDR_POST_HEX),
        filler,
    )
    mp4_hex = F.concat(F.lit(_MP4_FTYP_HEX), filler)
    return docs_df.select(
        F.concat(
            F.when(is_video, F.lit("vid://")).otherwise(F.lit("img://")),
            F.col("doc_id").cast("string"),
        ).alias("media_ref"),
        F.when(is_video, F.lit("video")).otherwise(F.lit("image")).alias("media_kind"),
        F.unhex(F.when(is_video, mp4_hex).otherwise(png_hex)).alias("payload"),
        width.alias("width"),
        height.alias("height"),
        F.when(is_video, ((F.pmod("doc_id", F.lit(29)) * 1000) + 1000).cast("int"))
        .otherwise(F.lit(0).cast("int"))
        .alias("duration_ms"),
    )


def parse_image_header(raw: bytes):
    """Spec-compliant stdlib header parse for PNG / GIF / JPEG.

    Returns ``(codec, width, height)`` or ``None``.  This is a *real*
    decoder for the metadata tier: signatures and dimension fields are read
    exactly as the container specs define them (PNG IHDR big-endian u32s,
    GIF logical-screen little-endian u16s, JPEG SOFn scan)."""
    if len(raw) >= 24 and raw[:8] == b"\x89PNG\r\n\x1a\n" and raw[12:16] == b"IHDR":
        w, h = struct.unpack(">II", raw[16:24])
        return ("png", w, h)
    if len(raw) >= 10 and raw[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", raw[6:10])
        return ("gif", w, h)
    if len(raw) >= 4 and raw[:2] == b"\xff\xd8":
        i = 2
        while i + 9 <= len(raw):
            if raw[i] != 0xFF:
                break
            marker = raw[i + 1]
            if marker in (0x01,) or 0xD0 <= marker <= 0xD9:
                i += 2
                continue
            seg_len = int.from_bytes(raw[i + 2 : i + 4], "big")
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                if i + 9 <= len(raw):
                    h, w = struct.unpack(">HH", raw[i + 5 : i + 9])
                    return ("jpeg", w, h)
                break
            i += 2 + seg_len
    return None


def _pil_available() -> bool:
    try:
        import PIL.Image  # noqa: F401

        return True
    except ImportError:
        return False


def decode_image_real(payload: bytes):
    """Full pixel decode via PIL (import-guarded; pillow is absent in this
    container).  Returns ``(codec, width, height, mean_pixel)``."""
    try:
        import io

        from PIL import Image
    except ImportError as exc:  # pragma: no cover - env has no PIL
        raise NotImplementedError(
            "pixel decoding requires pillow; the header-parse tier "
            "(parse_image_header) covers dimensions without it"
        ) from exc
    img = Image.open(io.BytesIO(payload))  # pragma: no cover - env has no PIL
    import numpy as np  # pragma: no cover

    arr = np.asarray(img.convert("L"), dtype=np.float64)  # pragma: no cover
    return (img.format or "?").lower(), img.width, img.height, float(arr.mean())  # pragma: no cover


def _fake_features(payload: bytes, n: int = 8) -> list[float]:
    """Deterministic stand-in for a decoded-image feature vector."""
    digest = hashlib.sha256(payload or b"").digest()
    return [int.from_bytes(digest[i * 4 : i * 4 + 4], "big") / 2**32 for i in range(n)]


def extract_media_features(media_df: DataFrame, allow_pil: bool = True) -> DataFrame:
    """Arrow-batched feature/metadata extraction over binary payloads.

    Per payload: sizes + hashes always; then the decode tiers -- PIL pixel
    decode when importable (``decoder='pil'``), else the stdlib header parse
    (``decoder='header:<codec>'``), else the deterministic stub
    (``decoder='stub'``).  ``payload_md5`` is md5 of the lowercase hex of
    the bytes (SQL engines generally hash strings, not blobs)."""

    def batches(iterator):
        import pandas as pd

        use_pil = allow_pil and _pil_available()
        for pdf in iterator:
            out = {
                "media_ref": pdf["media_ref"],
                "media_kind": pdf["media_kind"],
                "n_bytes": [],
                "sha256": [],
                "payload_md5": [],
                "decoded_width": [],
                "decoded_height": [],
                "decoder": [],
                "features": [],
            }
            for p in pdf["payload"].tolist():
                raw = bytes(p) if p is not None else b""
                out["n_bytes"].append(len(raw))
                out["sha256"].append(hashlib.sha256(raw).hexdigest())
                out["payload_md5"].append(hashlib.md5(raw.hex().encode()).hexdigest())
                w = h = None
                decoder = "stub"
                feats = None
                if use_pil:  # pragma: no cover - env has no PIL
                    try:
                        _, w, h, mean_pixel = decode_image_real(raw)
                        decoder = "pil"
                        feats = [mean_pixel / 255.0] * 8
                    except Exception:
                        w = h = None
                if w is None:
                    parsed = parse_image_header(raw)
                    if parsed is not None:
                        codec, w, h = parsed
                        decoder = f"header:{codec}"
                out["decoded_width"].append(w)
                out["decoded_height"].append(h)
                out["decoder"].append(decoder)
                out["features"].append(feats if feats is not None else _fake_features(raw))
            yield pd.DataFrame(out)

    cols = ["media_ref", "media_kind", "payload"]
    return media_df.select(*cols).mapInPandas(batches, FEATURES_SCHEMA)


RESIZE_SCHEMA = StructType(
    [
        StructField("media_ref", StringType()),
        StructField("media_kind", StringType()),
        StructField("payload", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("resized", BooleanType()),
    ]
)


def resize_images(media_df: DataFrame, target_w: int, target_h: int, allow_pil: bool = True) -> DataFrame:
    """Resize plumbing: binary-in/binary-out Arrow-batched kernel.

    With PIL importable this is a real resample + re-encode (seam gated);
    without it, payloads whose *header parses as an image* get a structural
    resize -- a rebuilt PNG prefix carrying the target dimensions plus a
    deterministic filler sized to the target pixel count (the batch shape,
    schema and metadata flow are exactly what the PIL kernel uses).
    Non-image payloads pass through unchanged with ``resized=false``."""
    filler_len = max(16, (target_w * target_h) // 256)

    def batches(iterator):
        import pandas as pd

        use_pil = allow_pil and _pil_available()
        header = (
            bytes.fromhex(_PNG_SIG_HEX + _PNG_IHDR_PRE_HEX)
            + struct.pack(">II", target_w, target_h)
            + bytes.fromhex(_PNG_IHDR_POST_HEX)
        )
        filler = (b"\xab\xcd\xef" * (filler_len // 3 + 1))[:filler_len]
        for pdf in iterator:
            payloads, widths, heights, resized = [], [], [], []
            for p in pdf["payload"].tolist():
                raw = bytes(p) if p is not None else b""
                if use_pil:  # pragma: no cover - env has no PIL
                    try:
                        import io

                        from PIL import Image

                        img = Image.open(io.BytesIO(raw)).resize((target_w, target_h))
                        buf = io.BytesIO()
                        img.save(buf, format="PNG")
                        payloads.append(buf.getvalue())
                        widths.append(target_w)
                        heights.append(target_h)
                        resized.append(True)
                        continue
                    except Exception:
                        pass
                if parse_image_header(raw) is not None:
                    payloads.append(header + filler)
                    widths.append(target_w)
                    heights.append(target_h)
                    resized.append(True)
                else:
                    payloads.append(raw)
                    widths.append(None)
                    heights.append(None)
                    resized.append(False)
            yield pd.DataFrame(
                {
                    "media_ref": pdf["media_ref"],
                    "media_kind": pdf["media_kind"],
                    "payload": payloads,
                    "width": widths,
                    "height": heights,
                    "resized": resized,
                }
            )

    return media_df.select("media_ref", "media_kind", "payload").mapInPandas(
        batches, RESIZE_SCHEMA
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
    sampler produces, as an Arrow-batched kernel.  Non-video rows emit
    nothing; output row count is min(duration_ms // every_ms + 1, max_frames)
    per video.  The stub frame payload is the ASCII md5 of
    ``<payload hex>:<frame idx>`` -- deterministic and reconstructable by a
    SQL oracle (a real ffmpeg kernel swaps only the inner function)."""

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
                    frames.append(
                        hashlib.md5(f"{raw.hex()}:{i}".encode()).hexdigest().encode()
                    )
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
