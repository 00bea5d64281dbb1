"""Multi-page article assembly (reference: NReadabilityWebTranscoder.cs).

The reference crawls next-page links recursively (fetch -> transcode ->
append, NReadabilityWebTranscoder.cs:163-287).  At 10^12-document scale all
pages are already rows in the input table, so the crawl becomes:

1. **chain resolution** -- pure DataFrame ops: edges ``(url -> next_page_url)``
   from the extraction pass, roots = pages nobody links to, then <=30
   iterative joins walking the chains with visited-set loop protection
   (the frontier shrinks every round; chains are rare and short, so each
   round's join is tiny and broadcastable);
2. **assembly** -- an Arrow-batched kernel applying the reference's exact
   per-page merge semantics: drop page-2+ ``<h1>`` (:235-240), first-long-
   paragraph duplicate check against accumulated text (:247-266), page
   separator + ``readability-page-N`` wrapper divs (:37-38,269-279), 30-page
   cap with a "View Next Page" stub (:34,216-221).

``transcode_web`` is the single-document convenience mirroring
``NReadabilityWebTranscoder.Transcode`` with a pluggable fetcher (the
reference's test harness shape, FileBasedUrlFetcherStub.cs:1-44).
"""

from __future__ import annotations

import re

from .dom import Node
from .kernel import Options, transcode
from .spans import extract_spans

MAX_PAGES = 30  # NReadabilityWebTranscoder.cs:34
PAGE_ID_PREFIX = "readability-page-"  # :35

_TRAILING_SLASH_RE = re.compile(r"/$")


def page_separator(page_number: int) -> Node:
    """_DefaultPageSeparatorBuilder (:37-38): <p class='page-separator'
    title='Page N'>&sect;</p>."""
    p = Node("p", {"class": "page-separator", "title": f"Page {page_number}"})
    from .dom import TextNode

    t = TextNode("§")  # &sect;
    t.parent = p
    p.children.append(t)
    return p


def _first_paragraph_value(article: Node) -> str | None:
    first_p = next(article.elements_by_tag_name("p"), None)
    return first_p.value if first_p is not None else None


def assemble_pages(pages: list[tuple[str, str | None]], opts: Options | None = None) -> dict:
    """Merge an ordered multi-page chain into one article.

    ``pages`` is the resolved chain: ``[(html, url), ...]`` with page 1
    first; pass up to MAX_PAGES + 1 entries -- a 31st page becomes the
    "View Next Page" stub like the reference (:216-221).

    Returns ``{spans, title, content_extracted, n_pages, page_urls}`` where
    the spans serialize every appended page's content in order (separators
    included as text spans).
    """
    opts = opts or Options()
    if not pages:
        return {
            "spans": [],
            "title": None,
            "content_extracted": False,
            "n_pages": 0,
            "page_urls": [],
        }

    html0, url0 = pages[0]
    first = transcode(html0, url0, opts)

    # container mirroring readInner's article children: page divs in order
    container = Node("div")
    page1 = first.article_content
    appended_urls = [url0]
    cur_page = 1

    # accumulated text for the duplicate check = contentDiv.Value (:257)
    acc_parts = [page1.value]

    container.append_moved(page1)

    for html, url in pages[1:]:
        cur_page += 1
        if cur_page > MAX_PAGES:
            # :216-221 -- a centered "View Next Page" link stub
            stub = Node("div", {"style": "text-align: center"})
            link = Node("a", {"href": url or ""})
            from .dom import TextNode

            t = TextNode("View Next Page")
            t.parent = link
            link.children.append(t)
            stub.append_moved(link)
            container.append_moved(stub)
            break
        if html is None or html == "":
            break  # fetch failure ends the crawl (:225-228)

        nxt = transcode(html, url, opts)
        inner = nxt.article_content

        # drop the next page's h1 (title duplicate, :235-240).  The
        # reference removes readInner's direct <h1>; our article_content is
        # the content div (title h1 lives outside it), so any leading h1
        # inside the content is the in-body duplicate the rule targets.
        header = next(inner.elements_by_tag_name("h1"), None)
        if header is not None:
            header.remove()

        # anti-duplicate: first <p> with value > 100 chars already contained
        # (case-insensitive) in the accumulated content (:247-266)
        first_p_value = _first_paragraph_value(inner)
        if first_p_value and len(first_p_value) > 100:
            existing = "".join(acc_parts)
            if existing and first_p_value.lower() in existing.lower():
                break  # the reference stops recursing on a duplicate (:263)

        page_div = Node("div", {"id": f"{PAGE_ID_PREFIX}{cur_page}", "class": "page"})
        page_div.append_moved(page_separator(cur_page))
        for node in inner.children[:]:
            page_div.append_moved(node)
        container.append_moved(page_div)
        acc_parts.append(page_div.value)
        appended_urls.append(url)

    multi = len(appended_urls) > 1
    if multi:
        # rename page 1's div (:193-200)
        first_div = container.children[0]
        if first_div.is_element:
            first_div.set_attribute("id", f"{PAGE_ID_PREFIX}1")
            first_div.set_attribute("class", "page")

    return {
        "spans": extract_spans(container),
        "title": first.title,
        "content_extracted": first.content_extracted,
        "n_pages": len(appended_urls),
        "page_urls": appended_urls,
    }


def transcode_web(fetch, url: str, opts: Options | None = None, max_pages: int = MAX_PAGES) -> dict:
    """Single-document crawl mirroring NReadabilityWebTranscoder.Transcode
    (:105-160): ``fetch(url) -> html`` is the pluggable fetcher.  Resolves
    the chain with the reference's visited-set rule, then assembles."""
    opts = opts or Options()
    visited = {_TRAILING_SLASH_RE.sub("", url)}
    pages: list[tuple[str, str | None]] = []
    cur = url
    while cur is not None and len(pages) <= max_pages:
        html = fetch(cur)
        if not html:
            break
        pages.append((html, cur))
        result = transcode(html, cur, opts)
        nxt = result.next_page_url
        if not nxt or nxt in visited or _TRAILING_SLASH_RE.sub("", nxt) in visited:
            break
        visited.add(_TRAILING_SLASH_RE.sub("", nxt))
        cur = nxt
    return assemble_pages(pages, opts)


# ---------------------------------------------------------------------------
# Spark surface
# ---------------------------------------------------------------------------


def resolve_chains(extracted, url_col: str = "url", max_pages: int = MAX_PAGES):
    """Chain resolution over an extracted-pages DataFrame.

    Input must carry ``(doc_id, <url_col>, next_page_url)``.  Returns
    ``(root_doc_id, doc_id, page_num)`` assignments.  Driver-side loop of at
    most ``max_pages`` joins; every round the frontier only contains chains
    that still continue, so rounds after the longest chain are never run.
    """
    from pyspark.sql import functions as F

    # materialize the edge table once and truncate its lineage: every
    # iteration below joins against it, and without the checkpoint each
    # round would re-run the (expensive) extraction pass that produced
    # next_page_url, with cost growing per generation
    pages = extracted.select(
        F.col("doc_id"), F.col(url_col).alias("url"), F.col("next_page_url")
    ).localCheckpoint(eager=True)
    # roots: pages that are nobody's next page
    targets = pages.select(F.col("next_page_url").alias("url")).where(
        F.col("url").isNotNull()
    )
    roots = pages.join(targets, "url", "left_anti")

    frontier = roots.select(
        F.col("doc_id").alias("root_doc_id"),
        F.col("doc_id"),
        F.col("next_page_url"),
        F.lit(1).alias("page_num"),
        F.array(F.col("url")).alias("visited"),
    ).localCheckpoint(eager=True)
    assignments = [frontier.select("root_doc_id", "doc_id", "page_num")]

    nxt_pages = pages.select(
        F.col("url").alias("__nxt_url"),
        F.col("doc_id").alias("__nxt_doc_id"),
        F.col("next_page_url").alias("__nxt_next"),
    )
    for _ in range(max_pages):
        # stop early when no chain continues (driver-side emptiness check on
        # a tiny frame -- chains are a rarity at corpus scale)
        frontier = frontier.where(
            F.col("next_page_url").isNotNull()
            & ~F.array_contains(F.col("visited"), F.col("next_page_url"))
        )
        if frontier.isEmpty():
            break
        frontier = (
            frontier.join(
                nxt_pages, frontier.next_page_url == nxt_pages.__nxt_url, "inner"
            )
            .select(
                "root_doc_id",
                F.col("__nxt_doc_id").alias("doc_id"),
                F.col("__nxt_next").alias("next_page_url"),
                (F.col("page_num") + 1).alias("page_num"),
                F.array_append("visited", F.col("next_page_url")).alias("visited"),
            )
            # truncate lineage each generation: otherwise round k re-runs
            # all k-1 previous joins when the final union materializes
            .localCheckpoint(eager=True)
        )
        assignments.append(frontier.select("root_doc_id", "doc_id", "page_num"))

    out = assignments[0]
    for a in assignments[1:]:
        out = out.unionByName(a)
    return out


def extract_multipage(df, url_col: str = "url", spans_col: str = "spans"):
    """Full multi-page extraction over an interleaved-spans table that also
    carries page URLs: chains resolved relationally, then each chain's raw
    pages are assembled by the kernel in one Arrow batch pass.

    Output: one row per chain root --
    ``(doc_id, spans, title, content_extracted, n_pages)``.
    """
    import pyarrow as pa
    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        ArrayType,
        BooleanType,
        IntegerType,
        StringType,
        StructField,
        StructType,
    )

    from .pipeline import SPAN_TYPE, extract, html_from_spans_col

    # pass 1: per-page extraction for the next-page edges
    extracted = extract(df, url_col=url_col, spans_col=spans_col)
    pages_meta = extracted.select("doc_id", "next_page_url").join(
        df.select("doc_id", F.col(url_col).alias("url")), "doc_id"
    )
    chains = resolve_chains(pages_meta, "url")

    # pass 2: group each chain's raw html in page order, assemble in kernel
    raw = df.select(
        "doc_id",
        F.col(url_col).alias("url"),
        html_from_spans_col(spans_col).alias("html"),
    )
    chained = chains.join(raw, "doc_id").select(
        "root_doc_id", "page_num", "url", "html"
    )
    grouped = chained.groupBy("root_doc_id").agg(
        F.array_sort(
            F.collect_list(F.struct("page_num", "html", "url"))
        ).alias("pages")
    )

    out_schema = StructType(
        [
            StructField("doc_id", StringType()),
            StructField("spans", ArrayType(SPAN_TYPE)),
            StructField("title", StringType()),
            StructField("content_extracted", BooleanType()),
            StructField("n_pages", IntegerType()),
        ]
    )

    arrow_schema = pa.schema(
        [
            pa.field("doc_id", pa.string()),
            pa.field(
                "spans",
                pa.list_(
                    pa.struct(
                        [
                            pa.field("kind", pa.string()),
                            pa.field("text", pa.string()),
                            pa.field("media_ref", pa.string()),
                            pa.field("offset", pa.int32()),
                        ]
                    )
                ),
            ),
            pa.field("title", pa.string()),
            pa.field("content_extracted", pa.bool_()),
            pa.field("n_pages", pa.int32()),
        ]
    )

    def batches(iterator):
        opts = Options()
        for batch in iterator:
            rows = []
            for row in batch.to_pylist():
                pages = [(p["html"], p["url"]) for p in row["pages"]]
                merged = assemble_pages(pages, opts)
                rows.append(
                    {
                        "doc_id": row["root_doc_id"],
                        "spans": merged["spans"],
                        "title": merged["title"],
                        "content_extracted": merged["content_extracted"],
                        "n_pages": merged["n_pages"],
                    }
                )
            yield pa.RecordBatch.from_pylist(rows, schema=arrow_schema)

    return grouped.mapInArrow(batches, out_schema)
