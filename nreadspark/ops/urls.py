"""URL canonicalization + URL-based dedup as JVM column expressions.

The cheapest first-pass dedup a crawl pipeline runs BEFORE any content
hashing: two fetches of ``HTTP://Example.com:80/a/?utm_source=x&id=1#top``
and ``http://example.com/a?id=1`` are the same resource, and dropping one
at the URL layer avoids ever shuffling its payload through the content
dedup stages.

Everything is whole-stage-codegen string surgery (regexp_extract /
higher-order array functions) -- no Python, no UDF, no shuffle until the
final hash aggregation -- and each step mirrors
:func:`nreadspark.urlutil.canonical_url` token for token so the Python
reference, the Spark column and the DuckDB oracle agree byte-for-byte.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..urlutil import TRACKING_PARAMS

# same absolute-URL test as urlutil._ABSOLUTE_RE
_ABSOLUTE_PATTERN = r"^[a-zA-Z][a-zA-Z0-9+.\-]*://[^/?#]+"


def canonical_url_col(url) -> Column:
    """Column expression computing :func:`nreadspark.urlutil.canonical_url`
    (lowercase scheme/host, default ports off, fragment off, tracking
    params off, remaining params sorted, trailing path slashes collapsed;
    non-absolute URLs pass through)."""
    url = F.col(url) if isinstance(url, str) else url
    scheme = F.lower(F.regexp_extract(url, r"^([a-zA-Z][a-zA-Z0-9+.\-]*)://", 1))
    rest = F.regexp_replace(url, r"^[a-zA-Z][a-zA-Z0-9+.\-]*://", "")
    authority = F.regexp_extract(rest, r"^([^/?#]*)", 1)
    tail = rest.substr(F.length(authority) + 1, F.length(rest))
    # bracketed IPv6/IPvFuture literal wins over stop-at-first-colon
    # (mirrors urlutil._HOST_RE -- '[2001:db8::1]:8080' keeps the literal)
    host = F.lower(F.regexp_extract(authority, r"^(?:[^@]*@)?(\[[^\]]*\]|[^:]*)", 1))
    port0 = F.regexp_extract(authority, r":([0-9]+)$", 1)
    default_port = (
        F.when(scheme == "http", "80").when(scheme == "https", "443").otherwise("")
    )
    port = F.when(port0 == default_port, F.lit("")).otherwise(port0)
    # fragment first (mirrors urlutil): a '?' inside '#...' is fragment,
    # not query (SPA hash routes)
    tail_nf = F.regexp_extract(tail, r"^([^#]*)", 1)
    path0 = F.regexp_replace(F.regexp_extract(tail_nf, r"^([^?]*)", 1), r"/+$", "")
    path = F.when(path0 == "", F.lit("/")).otherwise(path0)
    query = F.regexp_extract(tail_nf, r"\?(.*)", 1)

    def keep(p):
        key = F.lower(F.element_at(F.split(p, "="), 1))
        tracking = key.isin(*sorted(TRACKING_PARAMS)) | key.startswith("utm_")
        return (F.length(p) > 0) & ~tracking

    q = F.array_join(F.sort_array(F.filter(F.split(query, "&"), keep)), "&")
    canon = F.concat(
        scheme,
        F.lit("://"),
        host,
        F.when(port != "", F.concat(F.lit(":"), port)).otherwise(F.lit("")),
        path,
        F.when(q != "", F.concat(F.lit("?"), q)).otherwise(F.lit("")),
    )
    return F.when(url.rlike(_ABSOLUTE_PATTERN), canon).otherwise(url)


def canonicalize_urls(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Add ``canonical_url`` next to the raw column -- the projection a
    crawl frontier or dedup stage composes over."""
    return df.withColumn("canonical_url", canonical_url_col(url_col))


def dedup_by_url(df: DataFrame, url_col: str = "url") -> DataFrame:
    """URL-level duplicate groups: one row per canonical URL with its
    fetch count and canonical (minimum) doc_id -- the
    :func:`..dedup.exact_duplicates` shape keyed on the canonical URL.
    Single hash aggregation with map-side combine; the canonicalization
    itself runs inside the scan projection.  Scales."""
    return (
        df.select(canonical_url_col(url_col).alias("canonical_url"), "doc_id")
        .groupBy("canonical_url")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.min("doc_id").cast("bigint").alias("canonical_doc_id"),
        )
    )


def keep_canonical_urls(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Survivor variant: keep only each canonical URL's minimum-doc_id row
    (plus every non-absolute-URL row untouched via its passthrough
    canonical form).  One aggregation + a broadcast-eligible semi-join on
    (canonical_url, doc_id)."""
    canon = df.withColumn("__canon", canonical_url_col(url_col))
    winners = canon.groupBy("__canon").agg(F.min("doc_id").alias("doc_id"))
    return canon.join(winners, ["__canon", "doc_id"], "left_semi").drop("__canon")
