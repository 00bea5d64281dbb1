"""Bytes-in ingestion: the fetcher semantics that survive into a batch
engine (reference UrlFetcher.cs) -- gzip/deflate bodies, Content-Type
charset, meta-tag charset sniff, BOM, fallback -- must yield span-identical
extractions to the pre-decoded string path."""

import gzip
import zlib

import pytest

from nreadspark.pipeline import decode_html_bytes

PAGE = (
    "<html><head><title>Prüfbericht | Säite</title>"
    '<meta http-equiv="Content-Type" content="text/html; charset={cs}" />'
    "</head><body><div id='content' class='post'>"
    "<p>Ein längerer Absatz, mit Kommata, und genug Text, um als Inhalt "
    "gewertet zu werden, über mehrere Sätze hinweg.</p>"
    "<p>Noch ein Absatz, ebenfalls länglich, damit die Gewichtung greift, "
    "süße Umlaute inklusive: äöüß.</p>"
    "</div></body></html>"
)


def test_meta_charset_latin1():
    html = PAGE.format(cs="iso-8859-1")
    assert decode_html_bytes(html.encode("latin-1")) == html


def test_header_charset_beats_meta():
    # meta says latin-1 but the header says utf-8; header wins (:192)
    html = PAGE.format(cs="iso-8859-1")
    raw = html.encode("utf-8")
    assert decode_html_bytes(raw, content_type="text/html; charset=utf-8") == html


def test_modern_meta_charset_form():
    html = "<html><head><meta charset='iso-8859-15'><title>T</title></head><body><p>œuvre €</p></body></html>"
    assert decode_html_bytes(html.encode("iso-8859-15")) == html


def test_bom_is_authoritative():
    html = PAGE.format(cs="iso-8859-1")  # lying meta tag
    raw = b"\xef\xbb\xbf" + html.encode("utf-8")
    assert decode_html_bytes(raw) == html


def test_utf16_bom():
    html = "<html><body><p>sixteen bits</p></body></html>"
    assert decode_html_bytes(html.encode("utf-16")) == html  # utf-16 adds BOM


def test_gzip_and_deflate_bodies():
    html = PAGE.format(cs="utf-8")
    raw = html.encode("utf-8")
    assert decode_html_bytes(gzip.compress(raw), content_encoding="gzip") == html
    assert decode_html_bytes(zlib.compress(raw), content_encoding="deflate") == html
    # raw deflate (.NET DeflateStream has no zlib wrapper)
    co = zlib.compressobj(wbits=-15)
    assert (
        decode_html_bytes(co.compress(raw) + co.flush(), content_encoding="deflate")
        == html
    )


def test_unknown_charset_falls_back():
    html = PAGE.format(cs="x-no-such-charset")
    assert decode_html_bytes(html.encode("utf-8")) == html


def test_no_signal_uses_fallback():
    body = "<html><body><p>plain ascii</p></body></html>"
    assert decode_html_bytes(body.encode(), fallback_encoding="utf-8") == body


@pytest.fixture(scope="module")
def spark():
    pytest.importorskip("pyspark")
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[4]")
        .appName("bytes-in-tests")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield s
    s.stop()


def test_bytes_path_matches_string_path(spark):
    """The VERDICT done-criterion: a latin-1 + meta-charset page extracted
    from raw bytes must yield identical spans to the pre-decoded run."""
    from pyspark.sql.types import BinaryType, StringType, StructField, StructType

    from nreadspark.pipeline import extract_from_html, extract_from_html_bytes

    html = PAGE.format(cs="iso-8859-1")
    bytes_schema = StructType(
        [StructField("doc_id", StringType()), StructField("content", BinaryType())]
    )
    str_schema = StructType(
        [StructField("doc_id", StringType()), StructField("html", StringType())]
    )
    bdf = spark.createDataFrame([("d1", html.encode("latin-1"))], bytes_schema)
    sdf = spark.createDataFrame([("d1", html)], str_schema)

    from_bytes = extract_from_html_bytes(bdf).collect()[0]
    from_str = extract_from_html(sdf).collect()[0]

    assert from_bytes["title"] == from_str["title"]
    assert from_bytes["content_extracted"] is True
    b_spans = [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in from_bytes["spans"]]
    s_spans = [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in from_str["spans"]]
    assert b_spans == s_spans
    assert any("äöüß" in (t or "") for _, t, _, _ in b_spans)


def test_bytes_path_gzip_end_to_end(spark):
    from pyspark.sql.types import BinaryType, StringType, StructField, StructType

    from nreadspark.pipeline import extract_from_html_bytes

    html = PAGE.format(cs="utf-8")
    schema = StructType(
        [
            StructField("doc_id", StringType()),
            StructField("content", BinaryType()),
            StructField("cenc", StringType()),
        ]
    )
    df = spark.createDataFrame([("d1", gzip.compress(html.encode()), "gzip")], schema)
    out = extract_from_html_bytes(df, content_encoding_col="cenc").collect()[0]
    assert out["content_extracted"] is True
    assert out["title"]


def test_quoted_header_charset_and_meta_fallback_after_bad_header():
    from nreadspark.pipeline import decode_html_bytes

    body = "<html><body><p>ж</p></body></html>"  # cyrillic zhe
    raw = body.encode("cp1251")
    # quoted charset in the header (common real-HTTP form)
    assert decode_html_bytes(raw, 'text/html; charset="windows-1251"') == body
    # unusable header charset -> the meta tag must still be consulted
    meta_body = (
        '<html><head><meta http-equiv="Content-Type" '
        'content="text/html; charset=windows-1251" /></head>'
        "<body><p>ж</p></body></html>"
    )
    raw2 = meta_body.encode("cp1251")
    assert decode_html_bytes(raw2, "text/html; charset=bogus-enc") == meta_body
