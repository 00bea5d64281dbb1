"""WARC ingestion (nreadspark/warc.py): writer/parser round-trip (plain +
per-record gzip members), HTTP response splitting, malformed-record
containment with resync, and the Spark record-explode + extraction
composition with header-driven charset decode."""

import pytest

pyspark = pytest.importorskip("pyspark")

from nreadspark.warc import (  # noqa: E402
    build_http_response,
    build_warc,
    build_warc_record,
    iter_warc_records,
    parse_http_response,
)


@pytest.fixture(scope="module")
def spark():
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[4]")
        .appName("warc-tests")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield s
    s.stop()


PAGES = [
    (f"http://ex.com/p/{i}", f"<html><body><p>page {i} body</p></body></html>".encode(), "text/html")
    for i in range(4)
]


@pytest.mark.parametrize("gz", [False, True])
def test_round_trip(gz):
    blob = build_warc(PAGES, gzip_records=gz)
    recs = list(iter_warc_records(blob))
    # warcinfo + (request, response) per page, all error-free
    assert [h.get("warc-type") for h, _, e in recs] == (
        ["warcinfo"] + ["request", "response"] * 4
    )
    assert all(e is None for _, _, e in recs)
    responses = [(h, b) for h, b, _ in recs if h.get("warc-type") == "response"]
    for (h, block), (url, payload, _) in zip(responses, PAGES):
        assert h["warc-target-uri"] == url
        status, http_hdrs, got = parse_http_response(block)
        assert status == 200 and got == payload
        assert http_hdrs["content-type"] == "text/html"


def test_malformed_records_contained_with_resync():
    good = build_warc_record("response", build_http_response(b"<p>ok</p>"),
                             target_uri="http://ex.com/ok")
    # garbage prefix, then a record with a bad length, then a good record
    bad_len = good.replace(b"Content-Length: ", b"Content-Length: x", 1)
    blob = b"JUNKJUNK" + good + bad_len + good
    recs = list(iter_warc_records(blob))
    errors = [e for _, _, e in recs if e]
    oks = [(h, b) for h, b, e in recs if e is None]
    assert any("garbage" in e for e in errors)
    assert any("Content-Length" in e for e in errors)
    assert len(oks) == 2  # both good records still parsed


def test_truncated_block_is_flagged():
    good = build_warc_record("response", build_http_response(b"x" * 100),
                             target_uri="http://ex.com/t")
    recs = list(iter_warc_records(good[: len(good) // 2]))
    assert recs[-1][2] is not None and "truncated" in recs[-1][2]


def test_bare_body_block_passes_through():
    status, hdrs, payload = parse_http_response(b"<html>no http envelope</html>")
    assert status is None and hdrs == {} and payload.startswith(b"<html>")


def test_spark_record_explode_and_error_containment(spark):
    from nreadspark.warc import warc_records

    rows = [
        ("a", build_warc(PAGES[:2])),
        ("b", build_warc(PAGES[2:], gzip_records=True)),
        ("c", b"\x00\x01 not a warc at all"),
        ("d", None),
    ]
    df = spark.createDataFrame(rows, "doc_id string, warc binary")
    recs = warc_records(df).collect()
    by_doc = {}
    for r in recs:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert len([r for r in by_doc["a"] if r["warc_type"] == "response"]) == 2
    assert len([r for r in by_doc["b"] if r["warc_type"] == "response"]) == 2
    assert all(r["error"] is None for r in by_doc["a"] + by_doc["b"])
    assert all(r["error"] is not None for r in by_doc["c"])  # garbage flagged
    assert "d" not in by_doc or all(r["error"] for r in by_doc["d"])


def test_extract_warc_end_to_end_with_header_charset(spark):
    """Multi-record blobs through the full composition: HTTP-200 responses
    extracted under the HTTP-header charset (latin-1 'café' survives), 404
    responses and request/warcinfo records filtered, composite doc ids."""
    import pyarrow as pa
    from pyspark.sql import functions as F

    from nreadspark.warc import build_warc_record, extract_warc

    def page(i):
        return (
            f"<html><head><title>T{i} | Site</title></head><body>"
            f"<div id='content' class='post'><p>plenty of words here, with commas, "
            f"long enough to score as real content at the café {i}.</p>"
            f"<p>second paragraph, also long enough, with more commas {i}.</p>"
            f"</div></body></html>"
        ).encode("latin-1")

    def blob(i):
        ok = build_warc(
            [(f"http://ex.com/d/{i}", page(i), "text/html; charset=iso-8859-1")]
        )
        # append a 404 response record: must be filtered by status
        nf = build_warc_record(
            "response",
            b"HTTP/1.1 404 Not Found\r\nContent-Type: text/html\r\n\r\n<p>nope</p>",
            target_uri=f"http://ex.com/missing/{i}",
        )
        return ok + nf

    rows = [(str(i), blob(i)) for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id string, warc binary")
    out = extract_warc(df).collect()
    assert len(out) == 6  # one 200-response per blob; 404s filtered
    for r in out:
        assert r["doc_id"].endswith("#2")  # warcinfo=0, request=1, response=2
        assert r["content_extracted"]
        assert any("café" in (s["text"] or "") for s in r["spans"])


def test_non_response_records_keep_their_blocks(spark):
    """resource/conversion/warcinfo blocks must survive into the content
    column (the record table is the routing surface for non-HTML payloads)."""
    from nreadspark.warc import warc_records

    res = build_warc_record(
        "resource", b"PK\x03\x04 fake zip bytes", target_uri="http://ex.com/a.zip",
        content_type="application/zip",
    )
    info = build_warc_record(
        "warcinfo", b"software: x\r\n", content_type="application/warc-fields"
    )
    df = spark.createDataFrame([("a", info + res)], "doc_id string, warc binary")
    rows = {r["warc_type"]: r for r in warc_records(df).collect()}
    assert bytes(rows["resource"]["content"]) == b"PK\x03\x04 fake zip bytes"
    assert rows["resource"]["content_type"] == "application/zip"
    assert bytes(rows["warcinfo"]["content"]) == b"software: x\r\n"


def test_corrupt_gzip_member_keeps_good_prefix():
    """A flipped byte in a later gzip member must not lose the blob's valid
    leading records (and must not raise out of the iterator)."""
    from nreadspark.warc import _gzip_member

    good1 = build_warc_record("response", build_http_response(b"<p>one</p>"),
                              target_uri="http://ex.com/1")
    good2 = build_warc_record("response", build_http_response(b"<p>two</p>"),
                              target_uri="http://ex.com/2")
    m1, m2 = _gzip_member(good1), _gzip_member(good2)
    corrupted = m1 + m2[:10] + bytes([m2[10] ^ 0xFF]) + m2[11:]
    recs = list(iter_warc_records(corrupted))
    oks = [(h, b) for h, b, e in recs if e is None]
    errs = [e for _, _, e in recs if e]
    assert len(oks) == 1 and oks[0][0]["warc-target-uri"] == "http://ex.com/1"
    assert any("gzip" in e for e in errs)
