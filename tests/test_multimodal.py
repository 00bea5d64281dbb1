"""Multimodal decode tiers: the stdlib header parser must read real PNG /
GIF / JPEG containers (crafted with valid structure, incl. a fully valid
zlib-compressed PNG), and the Spark kernels must surface the parsed
dimensions with the right decoder tag."""

import struct
import zlib

import pytest

from nreadspark.ops.multimodal import parse_image_header


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def make_real_png(w: int, h: int) -> bytes:
    """A fully valid minimal PNG (correct CRCs, real zlib IDAT)."""
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)  # 8-bit grayscale
    raw = b"".join(b"\x00" + bytes(w) for _ in range(h))  # filter 0 + zeros
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )


def make_gif(w: int, h: int) -> bytes:
    return b"GIF89a" + struct.pack("<HH", w, h) + b"\x00\x00\x00" + b"\x3b"


def make_jpeg(w: int, h: int) -> bytes:
    """SOI + APP0 (JFIF) + SOF0 carrying the dimensions."""
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    sof0 = b"\xff\xc0" + struct.pack(">H", 11) + b"\x08" + struct.pack(">HH", h, w) + b"\x01\x11\x00"
    return b"\xff\xd8" + app0 + sof0


def test_header_parse_real_png():
    assert parse_image_header(make_real_png(320, 200)) == ("png", 320, 200)


def test_header_parse_gif():
    assert parse_image_header(make_gif(17, 31)) == ("gif", 17, 31)


def test_header_parse_jpeg_sof_scan():
    assert parse_image_header(make_jpeg(640, 480)) == ("jpeg", 640, 480)


def test_header_parse_rejects_garbage():
    assert parse_image_header(b"") is None
    assert parse_image_header(b"\x00" * 64) is None
    assert parse_image_header(b"\x89PNG\r\n\x1a\n" + b"\x00" * 4) is None  # truncated
    assert parse_image_header(b"\xff\xd8\xff\xe0\x00\x02") is None  # no SOF


def test_header_parse_synthetic_fake_png():
    """The synthesized media payloads are structurally valid PNG prefixes."""
    hx = (
        "89504e470d0a1a0a0000000d49484452"
        + format(100, "08x")
        + format(50, "08x")
        + "080600000000000000"
        + "abcdef" * 3
    )
    assert parse_image_header(bytes.fromhex(hx)) == ("png", 100, 50)


@pytest.fixture(scope="module")
def spark():
    pytest.importorskip("pyspark")
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[4]")
        .appName("multimodal-tests")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield s
    s.stop()


def test_extract_features_decodes_real_images(spark):
    """A real PNG flowing through the Spark kernel gets real dimensions and
    a 'real decoder' tag (pil when importable, header parse otherwise)."""
    from nreadspark.ops.multimodal import extract_media_features

    rows = [
        ("png1", "image", make_real_png(12, 34), 12, 34, 0),
        ("gif1", "image", make_gif(5, 6), 5, 6, 0),
        ("jpg1", "image", make_jpeg(7, 8), 7, 8, 0),
        ("bin1", "audio", b"\x00\x01\x02\x03", None, None, 0),
    ]
    from nreadspark.ops.multimodal import MEDIA_SCHEMA

    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r["media_ref"]: r for r in extract_media_features(df).collect()}
    assert (out["png1"]["decoded_width"], out["png1"]["decoded_height"]) == (12, 34)
    assert out["png1"]["decoder"] in ("pil", "header:png")
    assert (out["gif1"]["decoded_width"], out["gif1"]["decoded_height"]) == (5, 6)
    assert (out["jpg1"]["decoded_width"], out["jpg1"]["decoded_height"]) == (7, 8)
    assert out["bin1"]["decoder"] == "stub"
    assert out["bin1"]["decoded_width"] is None
    assert out["bin1"]["n_bytes"] == 4


def test_resize_structural_and_passthrough(spark):
    from nreadspark.ops.multimodal import MEDIA_SCHEMA, parse_image_header, resize_images

    rows = [
        ("png1", "image", make_real_png(100, 80), 100, 80, 0),
        ("bin1", "audio", b"\x99" * 10, None, None, 0),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r["media_ref"]: r for r in resize_images(df, 224, 224).collect()}
    assert out["png1"]["resized"] is True
    assert parse_image_header(bytes(out["png1"]["payload"]))[1:] == (224, 224)
    assert out["bin1"]["resized"] is False
    assert bytes(out["bin1"]["payload"]) == b"\x99" * 10
