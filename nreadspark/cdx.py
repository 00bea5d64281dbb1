"""CDX(J) crawl-index tier: SURT urlkeys, index parsing, fetch planning,
and index-driven selective WARC record reads.

A web-scale crawl never re-scans its WARC files to find pages: alongside
every segment ships a CDX(J) index -- one line per capture::

    <urlkey> <timestamp> <json>

where ``urlkey`` is the SURT (Sort-friendly URI Reordering Transform) of
the capture URL, ``timestamp`` is YYYYMMDDhhmmss, and the JSON carries at
least ``{"url", "filename", "offset", "length", "status", "mime",
"digest"}`` -- the byte range of the capture's own gzip member inside its
``.warc.gz``.  Selecting a domain slice of a 100 TB crawl is therefore an
INDEX query (table-sized: ~10^10 short rows, not 10^12 payloads) followed
by ranged reads of exactly the chosen members -- the whole point of the
per-record-member ``.warc.gz`` layout ``nreadspark.warc`` already parses.

This module implements that path end to end:

* :func:`surt_key` / :func:`surt_key_col` -- the SURT subset that makes
  index keys prefix-searchable by domain: lowercase, scheme dropped,
  leading ``www.`` dropped, host labels REVERSED and comma-joined
  (``com,example``), default ports off, ``)`` separator, fragment off,
  query params sorted.  Python reference and Spark column mirror each
  other token for token (the ``canonical_url`` discipline), with the
  parsing layers staged as child projections (the multiply-referenced-
  expression rule).
* :func:`cdx_lines` -- parse raw CDXJ lines into typed columns, JVM-side
  (``split + from_json``), malformed lines contained as error rows.
* :func:`plan_fetches` -- prefix-select captures (e.g. one domain),
  keep the latest capture per urlkey, and emit the (filename, offset,
  length) fetch plan.  Shuffle profile: ONE window over the SELECTED
  slice only; the full index is touched by a scan with the prefix
  filter pushed down.
* :func:`warc_records_from_ranges` -- execute the plan against local
  ``.warc.gz`` files: seek to each offset, inflate that single member,
  parse that single record (per-record containment as everywhere in
  ``nreadspark.warc``).  One ``mapInArrow`` pass; plans are grouped per
  file by a partition-local sort so each file opens once per partition.

Format background is public: ISO 28500 (WARC), the pywb / OpenWayback
CDXJ conventions, and Internet Archive SURT documentation.  No reference
counterpart (NReadability transcodes a single in-memory page); this is
the crawl-scale ingestion tier in front of it, sibling to
``nreadspark/warc.py``.
"""

from __future__ import annotations

import json
import re
import zlib

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from .urlutil import (
    TRACKING_PARAMS,
    _DEFAULT_PORTS,
    _HOST_RE,
    _PORT_RE,
    _SCHEME_RE,
    _ABSOLUTE_RE,
)

# ---------------------------------------------------------------------------
# SURT


def surt_key(url: str) -> str:
    """SURT urlkey of an absolute URL; non-absolute URLs pass through.

    ``HTTP://www.Example.COM:80/Art/One?b=2&a=1#frag`` ->
    ``com,example)/art/one?a=1&b=2``.  Deliberate subset (documented
    divergences from the full IA spec): tracking params are dropped (the
    :data:`~nreadspark.urlutil.TRACKING_PARAMS` + ``utm_*`` set shared
    with ``canonical_url``), the PATH IS LOWERCASED (CDX convention --
    unlike ``canonical_url``, which preserves path case for dedup
    safety; an index key only has to be *consistent*), and userinfo is
    dropped with the port rules of ``canonical_url``."""
    m = _SCHEME_RE.match(url or "")
    if not m or not _ABSOLUTE_RE.match(url):
        return url
    scheme = m.group(1).lower()
    rest = url[m.end() :]
    slash = re.search(r"[/?#]", rest)
    authority, tail = (rest, "") if slash is None else (
        rest[: slash.start()], rest[slash.start() :]
    )
    host = _HOST_RE.match(authority).group(1).lower()
    if host.startswith("www."):
        host = host[4:]
    pm = _PORT_RE.search(authority)
    port = pm.group(1) if pm else ""
    if port == _DEFAULT_PORTS.get(scheme, ""):
        port = ""
    # fragment first (a '?' inside '#...' is fragment, not query)
    tail_nf = re.match(r"^([^#]*)", tail).group(1).lower()
    path = re.match(r"^([^?]*)", tail_nf).group(1)
    qm = re.search(r"\?(.*)", tail_nf)
    query = qm.group(1) if qm else ""
    path = re.sub(r"/+$", "", path) or "/"
    kept = sorted(
        p
        for p in query.split("&")
        if p and p.split("=", 1)[0] not in TRACKING_PARAMS
        and not p.startswith("utm_")
    )
    # bracketed IPv6 literals don't label-reverse; keep them verbatim
    rev = host if host.startswith("[") else ",".join(reversed(host.split(".")))
    out = rev + (f":{port}" if port else "") + ")" + path
    if kept:
        out += "?" + "&".join(kept)
    return out


def surt_key_col(df: DataFrame, url_col: str = "url", out_col: str = "urlkey") -> DataFrame:
    """Add ``out_col`` = :func:`surt_key` of ``url_col`` -- whole-stage
    codegen string surgery with each parsing layer staged as a child
    projection (the re-inlined single-Column form re-runs the authority
    chain per layer; see ``ops.urls.with_canonical_url``)."""
    from .colmemo import memo_cols

    def build():
        url = F.col(url_col)
        staged = {
            "__sk_scheme": F.lower(
                F.regexp_extract(url, r"^([a-zA-Z][a-zA-Z0-9+.\-]*)://", 1)
            ),
            "__sk_rest": F.regexp_replace(
                url, r"^[a-zA-Z][a-zA-Z0-9+.\-]*://", ""
            ),
        }
        staged2 = {
            "__sk_auth": F.regexp_extract("__sk_rest", r"^([^/?#]*)", 1),
        }
        staged3 = {
            "__sk_tail": F.col("__sk_rest").substr(
                F.length("__sk_auth") + 1, F.length("__sk_rest")
            ),
            "__sk_host0": F.lower(
                F.regexp_extract("__sk_auth", r"^(?:[^@]*@)?(\[[^\]]*\]|[^:]*)", 1)
            ),
            "__sk_port0": F.regexp_extract("__sk_auth", r":([0-9]+)$", 1),
        }
        default_port = (
            F.when(F.col("__sk_scheme") == "http", "80")
            .when(F.col("__sk_scheme") == "https", "443")
            .otherwise("")
        )
        staged4 = {
            "__sk_host": F.regexp_replace("__sk_host0", r"^www\.", ""),
            "__sk_port": F.when(
                F.col("__sk_port0") == default_port, F.lit("")
            ).otherwise(F.col("__sk_port0")),
            "__sk_tailnf": F.lower(F.regexp_extract("__sk_tail", r"^([^#]*)", 1)),
        }
        staged5 = {
            "__sk_path0": F.regexp_replace(
                F.regexp_extract("__sk_tailnf", r"^([^?]*)", 1), r"/+$", ""
            ),
            "__sk_query": F.regexp_extract("__sk_tailnf", r"\?(.*)", 1),
        }

        def keep(p):
            key = F.element_at(F.split(p, "="), 1)
            tracking = key.isin(*sorted(TRACKING_PARAMS)) | key.startswith("utm_")
            return (F.length(p) > 0) & ~tracking

        q = F.array_join(
            F.sort_array(F.filter(F.split("__sk_query", "&"), keep)), "&"
        )
        rev = F.when(
            F.col("__sk_host").startswith("["), F.col("__sk_host")
        ).otherwise(F.array_join(F.reverse(F.split("__sk_host", r"\.")), ","))
        key = F.concat(
            rev,
            F.when(
                F.col("__sk_port") != "", F.concat(F.lit(":"), F.col("__sk_port"))
            ).otherwise(F.lit("")),
            F.lit(")"),
            F.when(F.col("__sk_path0") == "", F.lit("/")).otherwise(
                F.col("__sk_path0")
            ),
            F.when(q != "", F.concat(F.lit("?"), q)).otherwise(F.lit("")),
        )
        final = F.when(
            url.rlike(r"^[a-zA-Z][a-zA-Z0-9+.\-]*://[^/?#]+"), key
        ).otherwise(url)
        return (staged, staged2, staged3, staged4, staged5, final)

    # the whole staged-column bundle is a pure function of url_col --
    # memoized per SparkContext (colmemo); the withColumns batches also
    # cut the per-withColumn analyzer passes the old 12-call chain paid
    staged, staged2, staged3, staged4, staged5, final = memo_cols(
        ("surt_key", url_col), build
    )
    out = (
        df.withColumns(staged)
        .withColumns(staged2)
        .withColumns(staged3)
        .withColumns(staged4)
        .withColumns(staged5)
        .withColumn(out_col, final)
    )
    return out.drop(*[c for c in out.columns if c.startswith("__sk_")])


# ---------------------------------------------------------------------------
# CDXJ parse

_CDX_JSON_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("filename", StringType()),
        StructField("offset", LongType()),
        StructField("length", LongType()),
        StructField("status", IntegerType()),
        StructField("mime", StringType()),
        StructField("digest", StringType()),
    ]
)


def cdx_lines(df: DataFrame, line_col: str = "line") -> DataFrame:
    """Parse raw CDXJ lines into (urlkey, timestamp, url, filename,
    offset, length, status, mime, digest, cdx_error) -- one JVM
    projection, zero Python, zero shuffle.

    Containment: a line whose JSON third field fails to parse (or that
    has fewer than 3 space-separated fields) keeps its raw urlkey/
    timestamp best-effort and sets ``cdx_error`` -- an index shard with
    one mangled line must not kill the fetch-planning job."""
    line = F.col(line_col)
    df = df.withColumn("__cdx_key", F.split_part(line, F.lit(" "), F.lit(1)))
    df = df.withColumn("__cdx_ts", F.split_part(line, F.lit(" "), F.lit(2)))
    # everything after the 2nd space is the JSON blob (it contains spaces)
    df = df.withColumn(
        "__cdx_json",
        F.expr(
            f"substring({line_col}, length(__cdx_key) + length(__cdx_ts) + 3)"
        ),
    )
    df = df.withColumn("__cdx", F.from_json("__cdx_json", _CDX_JSON_SCHEMA))
    out = df.select(
        *[c for c in df.columns if not c.startswith("__cdx") and c != line_col],
        F.col("__cdx_key").alias("urlkey"),
        F.col("__cdx_ts").alias("timestamp"),
        F.col("__cdx.url").alias("url"),
        F.col("__cdx.filename").alias("filename"),
        F.col("__cdx.offset").alias("offset"),
        F.col("__cdx.length").alias("length"),
        F.col("__cdx.status").alias("status"),
        F.col("__cdx.mime").alias("mime"),
        F.col("__cdx.digest").alias("digest"),
        (
            F.col("__cdx").isNull()
            | F.col("__cdx.filename").isNull()
            | F.col("__cdx.offset").isNull()
            | F.col("__cdx.length").isNull()
        ).alias("cdx_error"),
    )
    return out


def plan_fetches(
    cdx_df: DataFrame,
    urlkey_prefixes: list[str],
    statuses: tuple[int, ...] | None = (200,),
    latest_only: bool = True,
    include_null_status: bool = False,
) -> DataFrame:
    """Select captures by SURT prefix and emit the fetch plan:
    (urlkey, timestamp, url, filename, offset, length).

    ``urlkey_prefixes`` are domain-level SURT prefixes (``"com,example)"``
    selects exactly one registrable name; ``"com,example,"`` adds its
    subdomains) -- prefix filters on the sort key are what the CDX format
    exists for, and they push down to the index scan.  ``latest_only``
    keeps the newest capture per urlkey (max timestamp, offset as the
    deterministic tiebreak) via ONE max_by aggregation over the selected
    slice -- the full index never shuffles.

    Status semantics: some CDXJ emitters omit ``status`` on well-formed
    records; ``isin`` evaluates to NULL there and the filter would drop
    them SILENTLY.  Default stays strict (missing status excluded --
    conservative for a fetch plan that expects HTTP 200 payloads), but
    ``include_null_status=True`` keeps those rows, and ``statuses=None``
    (or ``()``) disables status filtering entirely."""
    sel = cdx_df.filter(~F.col("cdx_error"))
    if statuses:
        cond = F.col("status").isin(*statuses)
        if include_null_status:
            cond = cond | F.col("status").isNull()
        sel = sel.filter(cond)
    prefix_match = None
    for p in urlkey_prefixes:
        cond = F.col("urlkey").startswith(p)
        prefix_match = cond if prefix_match is None else (prefix_match | cond)
    if prefix_match is not None:
        sel = sel.filter(prefix_match)
    cols = ["urlkey", "timestamp", "url", "filename", "offset", "length"]
    if not latest_only:
        return sel.select(*cols)
    # max_by on the (timestamp, offset) struct: one map-side-combined agg,
    # deterministic under ties by the offset tiebreak
    pick = F.max_by(
        F.struct(*[F.col(c) for c in cols[1:]]),
        F.struct(F.col("timestamp"), F.col("offset")),
    ).alias("__pick")
    agg = sel.groupBy("urlkey").agg(pick)
    return agg.select("urlkey", *[F.col(f"__pick.{c}").alias(c) for c in cols[1:]])


# ---------------------------------------------------------------------------
# ranged reads

_RANGE_SCHEMA = StructType(
    [
        StructField("urlkey", StringType()),
        StructField("url", StringType()),
        StructField("filename", StringType()),
        StructField("offset", LongType()),
        StructField("warc_type", StringType()),
        StructField("target_uri", StringType()),
        StructField("payload", BinaryType()),
        StructField("http_status", IntegerType()),
        StructField("http_headers", ArrayType(StringType())),
        StructField("content_type", StringType()),
        StructField("content_encoding", StringType()),
        StructField("error", StringType()),
    ]
)


def warc_records_from_ranges(
    plans_df: DataFrame, base_dir: str | None = None
) -> DataFrame:
    """Execute a fetch plan against local ``.warc.gz`` files: seek to each
    (offset, length), inflate that ONE gzip member, parse that ONE record.

    Scale shape: `repartition` on filename? No -- plans are sorted
    WITHIN each partition by (filename, offset) so a partition's ranges
    per file read in ascending-seek order and each file opens once per
    partition per run of consecutive rows; the task never holds more
    than one record decompressed (the round-5 streaming-WARC
    discipline).  Per-range containment: a bad offset/member yields an
    ``error`` row, never a task failure.  ``base_dir`` prefixes relative
    filenames (Common Crawl indexes carry segment-relative paths)."""
    from .warc import iter_warc_records, parse_http_response

    plans = plans_df.select("urlkey", "url", "filename", "offset", "length")
    plans = plans.sortWithinPartitions("filename", "offset")

    def batches(iterator):
        import pyarrow as pa

        open_name, fh = None, None

        def rows():
            nonlocal open_name, fh
            for batch in iterator:
                cols = {n: batch.column(n).to_pylist() for n in (
                    "urlkey", "url", "filename", "offset", "length")}
                for urlkey, url, fname, off, length in zip(
                    cols["urlkey"], cols["url"], cols["filename"],
                    cols["offset"], cols["length"],
                ):
                    path = (
                        f"{base_dir.rstrip('/')}/{fname}" if base_dir else fname
                    )
                    base = dict(urlkey=urlkey, url=url, filename=fname, offset=off)
                    try:
                        if open_name != path:
                            if fh is not None:
                                fh.close()
                            fh = open(path, "rb")
                            open_name = path
                        fh.seek(off)
                        member = fh.read(length)
                        blob = zlib.decompress(member, zlib.MAX_WBITS | 16)
                        recs = list(iter_warc_records(blob))
                        if not recs:
                            raise ValueError("no record in member")
                        hdrs, block, err = recs[0]
                        if err:
                            raise ValueError(err)
                        wtype = (hdrs.get("warc-type") or "").lower()
                        status, http_hdrs, payload = None, [], block
                        ctype = cenc = None
                        if wtype == "response":
                            status, hdr_map, payload = parse_http_response(block)
                            http_hdrs = sorted(
                                f"{k}: {v}" for k, v in hdr_map.items()
                            )
                            ctype = hdr_map.get("content-type")
                            cenc = hdr_map.get("content-encoding")
                        yield dict(
                            base,
                            warc_type=wtype,
                            target_uri=hdrs.get("warc-target-uri"),
                            payload=payload,
                            http_status=status,
                            http_headers=list(http_hdrs),
                            content_type=ctype,
                            content_encoding=cenc,
                            error=None,
                        )
                    except Exception as exc:  # per-range containment
                        yield dict(
                            base,
                            warc_type=None,
                            target_uri=None,
                            payload=None,
                            http_status=None,
                            http_headers=None,
                            content_type=None,
                            content_encoding=None,
                            error=f"{type(exc).__name__}: {exc}"[:200],
                        )

        arrow_schema = pa.schema(
            [
                pa.field("urlkey", pa.string()),
                pa.field("url", pa.string()),
                pa.field("filename", pa.string()),
                pa.field("offset", pa.int64()),
                pa.field("warc_type", pa.string()),
                pa.field("target_uri", pa.string()),
                pa.field("payload", pa.binary()),
                pa.field("http_status", pa.int32()),
                pa.field("http_headers", pa.list_(pa.string())),
                pa.field("content_type", pa.string()),
                pa.field("content_encoding", pa.string()),
                pa.field("error", pa.string()),
            ]
        )
        # try/finally, not a trailing close: if Spark abandons the iterator
        # early (limit/take, task kill, downstream error) the generator gets
        # GeneratorExit instead of running to completion, and the open file
        # handle would otherwise leak until GC -- pinning the WARC file on
        # some filesystems.
        buf = []
        try:
            for r in rows():
                buf.append(r)
                if len(buf) >= 256:
                    yield pa.RecordBatch.from_pylist(buf, schema=arrow_schema)
                    buf = []
            if buf:
                yield pa.RecordBatch.from_pylist(buf, schema=arrow_schema)
        finally:
            if fh is not None:
                fh.close()

    return plans.mapInArrow(batches, _RANGE_SCHEMA)


def schedule_frontier(
    plans_df: DataFrame, per_domain_per_slot: int = 1
) -> DataFrame:
    """Assign each planned fetch a politeness SLOT: within a slot, a
    domain never sees more than ``per_domain_per_slot`` requests, so a
    crawler draining slot 0, then slot 1, ... respects per-host rate
    limits no matter how many executors fetch in parallel (the slot is
    the unit you map to a crawl-delay tick).

    The SURT urlkey already leads with the reversed host --
    ``com,example)/path`` -- so the domain is ``split_part(urlkey, ')',
    1)``: zero re-parsing.  Shape: ONE window shuffle on the domain
    (same as ``cap_per_domain``); slot order is deterministic
    (urlkey, timestamp, offset).  Mega-domains serialize into many slots
    BY DESIGN -- that's the politeness constraint doing its job, not
    skew; everything else lands in slot 0."""
    from pyspark.sql.window import Window

    if per_domain_per_slot < 1:
        raise ValueError("per_domain_per_slot must be >= 1")
    domain = F.split_part(F.col("urlkey"), F.lit(")"), F.lit(1))
    w = Window.partitionBy("__domain").orderBy("urlkey", "timestamp", "offset")
    return (
        plans_df.withColumn("__domain", domain)
        .withColumn(
            "slot",
            ((F.row_number().over(w) - 1) / per_domain_per_slot).cast("int"),
        )
        .withColumnRenamed("__domain", "domain")
    )


def extract_cdx_ranges(
    plans_df: DataFrame,
    base_dir: str | None = None,
    max_doc_bytes: int | None = None,
) -> DataFrame:
    """Fetch plan -> extracted span table: the full index-driven path
    (:func:`plan_fetches` output in, readability spans out).  Keeps
    HTTP-200 response records and feeds payload bytes + HTTP charset/
    encoding + target URI into the bytes-extraction tier, exactly the
    ``extract_warc`` composition.  ``doc_id`` is
    ``<filename>#<offset>`` -- stable and collision-free (one member per
    offset), resumable by re-planning minus already-committed ids."""
    from .pipeline import extract_from_html_bytes

    recs = warc_records_from_ranges(plans_df, base_dir=base_dir)
    pages = recs.filter(
        F.col("error").isNull()
        & (F.col("warc_type") == "response")
        & (F.col("http_status") == 200)
    ).select(
        F.concat_ws("#", "filename", F.col("offset").cast("string")).alias("doc_id"),
        F.coalesce("target_uri", "url").alias("url"),
        F.col("payload").alias("content"),
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


# ---------------------------------------------------------------------------
# deterministic CDXJ + indexed-WARC synthesis (tests + oracles)


def build_warc_with_index(
    pages: list[tuple[str, bytes, str]],
    filename: str,
    timestamps: list[str] | None = None,
) -> tuple[bytes, list[str]]:
    """A per-record-member ``.warc.gz`` blob PLUS its CDXJ index lines --
    the paired artifact a crawler actually publishes.  ``pages`` is
    ``[(url, payload_bytes, http_content_type), ...]``; the index carries
    one line per RESPONSE record with the member's exact (offset, length)
    inside the blob, urlkey = :func:`surt_key` of the url."""
    from .warc import _gzip_member, build_http_response, build_warc_record

    members = [
        _gzip_member(
            build_warc_record(
                "warcinfo",
                b"software: nreadspark-synthetic\r\n",
                content_type="application/warc-fields",
            )
        )
    ]
    lines: list[str] = []
    offset = len(members[0])
    for i, (url, payload, ctype) in enumerate(pages):
        member = _gzip_member(
            build_warc_record(
                "response", build_http_response(payload, ctype), target_uri=url
            )
        )
        ts = timestamps[i] if timestamps else f"2026{(i % 12) + 1:02d}01000000"
        lines.append(
            build_cdxj_line(
                surt_key(url), ts, url, filename, offset, len(member)
            )
        )
        members.append(member)
        offset += len(member)
    return b"".join(members), lines


def build_cdxj_line(
    urlkey: str,
    timestamp: str,
    url: str,
    filename: str,
    offset: int,
    length: int,
    status: int = 200,
    mime: str = "text/html",
    digest: str = "-",
) -> str:
    """One CDXJ line with the canonical field order (deterministic --
    json.dumps with sort_keys=False over an explicit dict)."""
    blob = json.dumps(
        {
            "url": url,
            "filename": filename,
            "offset": offset,
            "length": length,
            "status": status,
            "mime": mime,
            "digest": digest,
        },
        separators=(", ", ": "),
    )
    return f"{urlkey} {timestamp} {blob}"
