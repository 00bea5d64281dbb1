"""Robots-directive hygiene: ``<meta name="robots">`` extraction as JVM
column expressions.

A crawl that trains on pages whose publishers opted out via
``<meta name="robots" content="noindex">`` is both a compliance and a
quality problem (noindexed pages are disproportionately login walls,
faceted-search chaff and staging leftovers).  The HTTP-header half of the
protocol (``X-Robots-Tag``) lives with the fetcher, out of scope for the
batch engine (SURVEY §2.1 S2); this module handles the in-document half.

Semantics (public robots-meta spec, as implemented by the major crawlers):
directives are comma-separated tokens inside the ``content`` attribute of
any ``<meta>`` tag whose ``name`` is ``robots`` (case-insensitive, either
attribute order, single or double quotes); ``none`` is shorthand for
``noindex, nofollow``; multiple robots tags union (any tag's ``noindex``
wins).  Decoy tags (``name="description" content="noindex"``) must NOT
match.

Shape: one ``regexp_extract_all`` over the raw HTML collects the meta
tags; filtering to robots tags and extracting their content attributes are
higher-order array functions over that staged array (child projection --
the multi-reference staging rule) -- all whole-stage codegen, zero
shuffles, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# every <meta ...> tag; robots filtering happens on the extracted array so
# the expensive full-text scan runs ONCE
_META_TAG = r"(?i)<meta\b[^>]*>"
# name="robots" / name='robots' / name=robots, either side of content
_NAME_ROBOTS = r"""(?i)\bname\s*=\s*("robots"|'robots'|robots[\s/>])"""
# quoted content attribute value (unquoted content is vanishingly rare in
# real markup and never produced by CMSes; documented limitation)
_CONTENT_ATTR = r"""(?i)\bcontent\s*=\s*["']([^"']*)["']"""


def _directive(contents: Column, token: str) -> Column:
    """True when any robots content lists ``token`` (or ``none``) as a
    comma/space-delimited directive -- substring hits inside other words
    do not count."""
    pat = rf"(?i)(^|[,\s])({token}|none)([,\s]|$)"
    return F.exists(contents, lambda c: c.rlike(pat))


def robots_meta(df: DataFrame, html_col: str = "html") -> DataFrame:
    """(doc_id, noindex, nofollow): the union of all ``<meta name=robots>``
    directives in the document.  NULL html -> (false, false): an absent
    page can't opt out."""
    d = (
        df.withColumn(
            "__rb_tags", F.regexp_extract_all(F.coalesce(F.col(html_col), F.lit("")), F.lit(_META_TAG), 0)
        )
        .withColumn(
            "__rb_contents",
            F.transform(
                F.filter(F.col("__rb_tags"), lambda t: t.rlike(_NAME_ROBOTS)),
                lambda t: F.regexp_extract(t, _CONTENT_ATTR, 1),
            ),
        )
    )
    return d.select(
        "doc_id",
        _directive(F.col("__rb_contents"), "noindex").alias("noindex"),
        _directive(F.col("__rb_contents"), "nofollow").alias("nofollow"),
    )


def drop_noindex(df: DataFrame, html_col: str = "html") -> DataFrame:
    """Survivor composition: remove documents whose markup opts out of
    indexing (``noindex`` or ``none``) before they enter extraction --
    cheapest at the top of the funnel, where the drop also saves the
    parse."""
    flags = robots_meta(df, html_col)
    keep = flags.filter(~F.col("noindex")).select("doc_id")
    return df.join(keep, "doc_id", "left_semi")
