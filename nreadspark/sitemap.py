"""Sitemap parsing + crawl-refresh planning: the discovery feed that
decides WHAT to (re)fetch, pairing with the CDX tier that decides what
was already captured.

Sitemaps (sitemaps.org protocol, referenced from robots.txt `Sitemap:`
lines) are the publisher-declared URL inventory: ``<urlset>`` files list
page URLs with optional ``<lastmod>``; ``<sitemapindex>`` files list
child sitemaps.  A refresh crawl joins the declared inventory against
the crawl's own CDX index (latest capture per SURT urlkey) and fetches
exactly the URLs that are new or declared modified since their last
capture -- the standard incremental-crawl shape, and at 10^9 URLs per
large site inventory it is an index-vs-index join, never a payload scan.

Everything here is JVM-side column work: XML fields are pulled with
anchored regexes (sitemaps are machine-generated and flat; a full XML
parser buys nothing at this tier and costs a Python crossing), entries
explode from one ``regexp_extract_all`` per file, and the refresh plan
is one join on the SURT urlkey.  Malformed blocks yield NULL fields,
never failures.

Sibling of ``nreadspark/cdx.py`` (capture side) and ``ops/robots.py``
(permission side); no reference counterpart.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# one <url>/<sitemap> block per array element; (?s) so blocks span lines
_URL_BLOCK = r"(?s)<url>(.*?)</url>"
_SITEMAP_BLOCK = r"(?s)<sitemap>(.*?)</sitemap>"
_LOC = r"(?s)<loc>\s*(.*?)\s*</loc>"
_LASTMOD = r"(?s)<lastmod>\s*(.*?)\s*</lastmod>"


def sitemap_entries(
    df: DataFrame, xml_col: str = "xml", id_col: str = "sitemap_url"
) -> DataFrame:
    """Explode sitemap XML into (``id_col``, kind, loc, lastmod) rows:
    ``kind='url'`` for page entries (``<urlset>``), ``kind='sitemap'``
    for child sitemaps (``<sitemapindex>`` -- feed those back through the
    fetch tier for one level of recursion per pass).  One
    ``regexp_extract_all`` per block type + posexplode, zero Python,
    zero shuffle; a block without ``<loc>`` keeps a NULL loc for the
    caller to drop or count."""
    xml = F.col(xml_col)

    def blocks(pattern: str, kind: str) -> DataFrame:
        exploded = df.select(
            F.col(id_col),
            F.explode(F.regexp_extract_all(xml, F.lit(pattern), F.lit(1))).alias(
                "__block"
            ),
        )
        return exploded.select(
            id_col,
            F.lit(kind).alias("kind"),
            F.nullif(F.regexp_extract("__block", _LOC, 1), F.lit("")).alias("loc"),
            F.nullif(F.regexp_extract("__block", _LASTMOD, 1), F.lit("")).alias(
                "lastmod"
            ),
        )

    return blocks(_URL_BLOCK, "url").unionByName(blocks(_SITEMAP_BLOCK, "sitemap"))


def lastmod_ts_col(lastmod) -> Column:
    """Normalize a W3C-datetime ``<lastmod>`` ('2026-08-17',
    '2026-08-17T09:30:00Z', ...) to the CDX 14-digit timestamp scale:
    strip non-digits, take the first 14, right-pad with zeros -- a
    date-only value becomes midnight, which is the conservative reading
    (any same-day capture counts as fresh).  NULL stays NULL."""
    col = F.col(lastmod) if isinstance(lastmod, str) else lastmod
    digits = F.regexp_replace(col, r"[^0-9]", "")
    return F.when(
        col.isNull() | (digits == ""), F.lit(None).cast("string")
    ).otherwise(F.rpad(F.substring(digits, 1, 14), 14, "0"))


def plan_refresh(
    entries_df: DataFrame,
    cdx_latest_df: DataFrame,
    fetch_unmodified_unknown: bool = True,
) -> DataFrame:
    """(urlkey, loc, lastmod_ts, captured_ts, reason): the URLs a refresh
    crawl should fetch, = declared inventory MINUS fresh captures.

    ``entries_df`` is :func:`sitemap_entries` output (kind='url' rows are
    used); ``cdx_latest_df`` is :func:`nreadspark.cdx.plan_fetches`
    output (latest capture per urlkey).  Reasons: ``new`` (never
    captured), ``modified`` (lastmod after the latest capture), and --
    when ``fetch_unmodified_unknown`` -- ``unknown`` (no lastmod
    declared and we hold a capture: publishers often omit lastmod, and
    whether to refetch those is a crawl-budget policy, so it's a flag).
    Scale shape: both sides reduce to (urlkey, 14-digit ts) in their
    scan projections; ONE join on the urlkey; sitemap inventory and CDX
    index are both table-sized, payloads never move."""
    from .cdx import surt_key_col

    urls = entries_df.filter(
        (F.col("kind") == "url") & F.col("loc").isNotNull()
    ).select(F.col("loc"), lastmod_ts_col("lastmod").alias("lastmod_ts"))
    urls = surt_key_col(urls, url_col="loc", out_col="urlkey")
    # publisher may list a URL in several sitemaps: keep the newest claim
    urls = urls.groupBy("urlkey").agg(
        F.max_by("loc", F.coalesce("lastmod_ts", F.lit(""))).alias("loc"),
        F.max("lastmod_ts").alias("lastmod_ts"),
    )
    caps = cdx_latest_df.select(
        "urlkey", F.col("timestamp").alias("captured_ts")
    )
    joined = urls.join(caps, "urlkey", "left")
    reason = (
        F.when(F.col("captured_ts").isNull(), "new")
        .when(
            F.col("lastmod_ts").isNotNull()
            & (F.col("lastmod_ts") > F.col("captured_ts")),
            "modified",
        )
        .when(F.col("lastmod_ts").isNull(), "unknown")
        .otherwise(F.lit(None))
    )
    out = joined.select("urlkey", "loc", "lastmod_ts", "captured_ts", reason.alias("reason"))
    keep = ["new", "modified"] + (["unknown"] if fetch_unmodified_unknown else [])
    return out.filter(F.col("reason").isin(*keep))


def build_sitemap_xml(entries: list[tuple[str, str | None]]) -> str:
    """Deterministic ``<urlset>`` document for tests/oracles:
    ``[(loc, lastmod|None), ...]``."""
    rows = []
    for loc, lastmod in entries:
        lm = f"<lastmod>{lastmod}</lastmod>" if lastmod else ""
        rows.append(f"<url><loc>{loc}</loc>{lm}</url>")
    return (
        '<?xml version="1.0" encoding="UTF-8"?>\n'
        '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
        + "".join(rows)
        + "</urlset>"
    )
