"""WARC (ISO 28500) ingestion -- the container format web crawls actually
ship (Common Crawl's ``.warc`` / ``.warc.gz``).

Record grammar (public spec, ISO 28500 / WARC 1.0-1.1)::

    WARC/1.0<CRLF>
    <name>: <value><CRLF> ...          (WARC-Type, WARC-Target-URI,
    <CRLF>                              Content-Length, ...)
    <Content-Length bytes of block>
    <CRLF><CRLF>

``.warc.gz`` is the same stream with every record its own gzip MEMBER
(members concatenate; each record stays independently seekable -- exactly
why crawls use it).  For ``WARC-Type: response`` records the block is an
HTTP/1.1 response: status line + headers + ``\\r\\n\\r\\n`` + payload;
charset and content-encoding ride in the HTTP headers.

Everything here is pure stdlib (``zlib``) with per-record error
containment: a malformed record yields an ``error``-tagged row and
parsing continues at the next record boundary -- one poisoned record must
never kill a 100 TB scan.  The Spark surface is ONE ``mapInArrow`` pass
(`warc_records`), and :func:`extract_warc` pipes the response payloads
straight into :func:`nreadspark.pipeline.extract_from_html_bytes` --
bytes cross the Arrow boundary once, strings never do.

No reference counterpart (the reference transcodes one in-memory page);
this is the ingestion tier in front of it at crawl scale.
"""

from __future__ import annotations

import hashlib
import zlib

_CRLF = b"\r\n"
_SEP = b"\r\n\r\n"


# ---------------------------------------------------------------------------
# writer (deterministic -- synthetic fixtures and tests)
# ---------------------------------------------------------------------------


def build_warc_record(
    warc_type: str,
    block: bytes,
    target_uri: str | None = None,
    content_type: str = "application/http;msgtype=response",
    extra_headers: dict[str, str] | None = None,
) -> bytes:
    """One serialized WARC record.  The record id is deterministic
    (md5 of type+uri+block) so fixtures are byte-stable."""
    rid = hashlib.md5(
        warc_type.encode() + (target_uri or "").encode() + block
    ).hexdigest()
    headers = [
        ("WARC-Type", warc_type),
        ("WARC-Record-ID", f"<urn:uuid:{rid}>"),
        ("WARC-Date", "2026-01-01T00:00:00Z"),
    ]
    if target_uri is not None:
        headers.append(("WARC-Target-URI", target_uri))
    headers.append(("Content-Type", content_type))
    for k, v in (extra_headers or {}).items():
        headers.append((k, v))
    headers.append(("Content-Length", str(len(block))))
    head = _CRLF.join(
        [b"WARC/1.0"] + [f"{k}: {v}".encode() for k, v in headers]
    )
    return head + _SEP + block + _SEP


def build_http_response(
    payload: bytes, content_type: str = "text/html", content_encoding: str | None = None
) -> bytes:
    """An HTTP/1.1 200 block for a response record."""
    lines = [b"HTTP/1.1 200 OK", b"Content-Type: " + content_type.encode()]
    if content_encoding:
        lines.append(b"Content-Encoding: " + content_encoding.encode())
    lines.append(b"Content-Length: " + str(len(payload)).encode())
    return _CRLF.join(lines) + _SEP + payload


def build_warc(
    pages: list[tuple[str, bytes, str]], gzip_records: bool = False
) -> bytes:
    """A full WARC blob: one warcinfo record, then per page a request
    record (headers-only stub) and a response record.  ``pages`` is
    ``[(url, payload_bytes, http_content_type), ...]``;
    ``gzip_records=True`` emits the standard per-record-member ``.warc.gz``
    layout."""
    records = [
        build_warc_record(
            "warcinfo",
            b"software: nreadspark-synthetic\r\n",
            content_type="application/warc-fields",
        )
    ]
    for url, payload, ctype in pages:
        records.append(
            build_warc_record(
                "request",
                b"GET / HTTP/1.1\r\nHost: x\r\n\r\n",
                target_uri=url,
                content_type="application/http;msgtype=request",
            )
        )
        records.append(
            build_warc_record(
                "response", build_http_response(payload, ctype), target_uri=url
            )
        )
    if gzip_records:
        return b"".join(_gzip_member(r) for r in records)
    return b"".join(records)


def _gzip_member(data: bytes) -> bytes:
    co = zlib.compressobj(9, zlib.DEFLATED, 16 + zlib.MAX_WBITS)
    return co.compress(data) + co.flush()


# ---------------------------------------------------------------------------
# parser
# ---------------------------------------------------------------------------


def _gunzip_members(blob: bytes) -> tuple[bytes, str | None]:
    """Decompress a concatenation of gzip members (the .warc.gz layout).
    A corrupt member stops decompression but keeps the good prefix:
    returns ``(data, error|None)`` so the caller can surface the loss as
    an error ROW instead of losing the blob's valid records."""
    out = []
    data = blob
    while data[:2] == b"\x1f\x8b":
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        try:
            out.append(d.decompress(data))
            out.append(d.flush())
        except zlib.error as exc:
            return b"".join(out), f"corrupt gzip member: {exc}"
        data = d.unused_data
    if data:  # trailing non-gzip garbage: surface it to the record parser
        out.append(data)
    return b"".join(out), None


def iter_warc_records(blob: bytes):
    """Yield ``(headers: dict[str,str], block: bytes, error: str|None)``
    per record.  Transparently gunzips per-record members.  On a malformed
    record the error row carries what went wrong and parsing resyncs at
    the next ``WARC/`` magic."""
    gzip_err = None
    if blob[:2] == b"\x1f\x8b":
        blob, gzip_err = _gunzip_members(blob)
    pos = 0
    n = len(blob)
    while pos < n:
        # skip inter-record CRLFs
        while blob[pos : pos + 2] == _CRLF:
            pos += 2
        if pos >= n:
            break
        if blob[pos : pos + 5] != b"WARC/":
            nxt = blob.find(b"WARC/", pos)
            yield {}, b"", f"garbage at offset {pos}"
            if nxt == -1:
                break
            pos = nxt
            continue
        head_end = blob.find(_SEP, pos)
        if head_end == -1:
            yield {}, b"", "truncated record header"
            break
        headers: dict[str, str] = {}
        for line in blob[pos:head_end].split(_CRLF)[1:]:
            k, _, v = line.partition(b":")
            if _:
                headers[k.decode("latin-1").strip().lower()] = v.decode(
                    "latin-1"
                ).strip()
        try:
            length = int(headers["content-length"])
        except (KeyError, ValueError):
            yield headers, b"", "missing/invalid Content-Length"
            nxt = blob.find(b"WARC/", head_end + 4)
            if nxt == -1:
                break
            pos = nxt
            continue
        body_start = head_end + 4
        if body_start + length > n:
            yield headers, blob[body_start:], "truncated record block"
            break
        yield headers, blob[body_start : body_start + length], None
        pos = body_start + length
    if gzip_err:
        # the good prefix's records were yielded above; the corrupt tail
        # surfaces as one error row instead of an exception
        yield {}, b"", gzip_err


def parse_http_response(block: bytes):
    """(status: int|None, headers: dict, payload: bytes) from an HTTP
    response block; a block without an HTTP status line is returned whole
    as the payload (some crawlers store bare bodies)."""
    if not block.startswith(b"HTTP/"):
        return None, {}, block
    head_end = block.find(_SEP)
    if head_end == -1:
        return None, {}, b""
    lines = block[:head_end].split(_CRLF)
    try:
        status = int(lines[0].split()[1])
    except (IndexError, ValueError):
        status = None
    headers: dict[str, str] = {}
    for line in lines[1:]:
        k, _, v = line.partition(b":")
        if _:
            headers[k.decode("latin-1").strip().lower()] = v.decode("latin-1").strip()
    return status, headers, block[head_end + 4 :]


# ---------------------------------------------------------------------------
# Spark surface
# ---------------------------------------------------------------------------

WARC_RECORDS_SCHEMA = (
    "doc_id string, record_idx int, warc_type string, url string, "
    "http_status int, content_type string, content_encoding string, "
    "content binary, error string"
)


def warc_records(df, warc_col: str = "warc", doc_id_col: str = "doc_id"):
    """Explode WARC blobs into records: one ``mapInArrow`` pass, one output
    row per record (response blocks split into HTTP headers -> the
    ``content_type``/``content_encoding`` columns -- and raw payload
    bytes).  Malformed records surface as ``error`` rows instead of
    failing the task.  No shuffle: records inherit the blob partitioning,
    exactly like the PDF tier."""
    import pyarrow as pa

    def batches(iterator):
        for batch in iterator:
            names = batch.schema.names
            ids = batch.column(names.index(doc_id_col)).to_pylist()
            blobs = batch.column(names.index(warc_col)).to_pylist()
            out = {k: [] for k in (
                "doc_id", "record_idx", "warc_type", "url", "http_status",
                "content_type", "content_encoding", "content", "error",
            )}
            for did, blob in zip(ids, blobs):
                raw = bytes(blob) if blob is not None else b""
                try:
                    for idx, (hdrs, block, err) in enumerate(iter_warc_records(raw)):
                        wtype = hdrs.get("warc-type")
                        status, ctype, cenc, payload = None, None, None, None
                        if err is None and wtype == "response":
                            status, http_hdrs, payload = parse_http_response(block)
                            ctype = http_hdrs.get("content-type")
                            cenc = http_hdrs.get("content-encoding")
                        elif err is None:
                            # non-response records (resource, conversion,
                            # warcinfo, request, metadata): the block IS the
                            # payload; content type from the WARC header --
                            # this table is the reusable routing surface,
                            # so no record's bytes are dropped
                            payload = block
                            ctype = hdrs.get("content-type")
                        out["doc_id"].append(str(did))
                        out["record_idx"].append(idx)
                        out["warc_type"].append(wtype)
                        out["url"].append(hdrs.get("warc-target-uri"))
                        out["http_status"].append(status)
                        out["content_type"].append(ctype)
                        out["content_encoding"].append(cenc)
                        out["content"].append(payload)
                        out["error"].append(err)
                except Exception as exc:  # blob-level containment
                    out["doc_id"].append(str(did))
                    out["record_idx"].append(-1)
                    for k in ("warc_type", "url", "content_type", "content_encoding"):
                        out[k].append(None)
                    out["http_status"].append(None)
                    out["content"].append(None)
                    out["error"].append(f"{type(exc).__name__}: {exc}")
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(out["doc_id"], pa.string()),
                    pa.array(out["record_idx"], pa.int32()),
                    pa.array(out["warc_type"], pa.string()),
                    pa.array(out["url"], pa.string()),
                    pa.array(out["http_status"], pa.int32()),
                    pa.array(out["content_type"], pa.string()),
                    pa.array(out["content_encoding"], pa.string()),
                    pa.array(out["content"], pa.binary()),
                    pa.array(out["error"], pa.string()),
                ],
                names=list(out.keys()),
            )

    return df.select(doc_id_col, warc_col).mapInArrow(batches, WARC_RECORDS_SCHEMA)


def extract_warc(
    df,
    warc_col: str = "warc",
    doc_id_col: str = "doc_id",
    max_doc_bytes: int | None = None,
):
    """WARC blobs -> extracted span table: explode records, keep HTTP-200
    response records, feed payload bytes + HTTP charset/encoding + target
    URI into the bytes-extraction tier.  Output doc_id is
    ``<blob id>#<record idx>`` (stable, collision-free across multi-record
    blobs); the page URL rides through for link resolution."""
    from pyspark.sql import functions as F

    from .pipeline import extract_from_html_bytes

    recs = warc_records(df, warc_col, doc_id_col).filter(
        F.col("error").isNull()
        & (F.col("warc_type") == "response")
        & (F.col("http_status") == 200)
    )
    pages = recs.select(
        F.concat_ws("#", "doc_id", F.col("record_idx").cast("string")).alias("doc_id"),
        F.col("url"),
        "content",
        "content_type",
        "content_encoding",
    )
    return extract_from_html_bytes(
        pages,
        bytes_col="content",
        url_col="url",
        content_type_col="content_type",
        content_encoding_col="content_encoding",
        max_doc_bytes=max_doc_bytes,
    )
