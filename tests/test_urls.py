"""URL resolution tests ported from the reference
(NReadabilityTranscoderTests.cs:676-771 TestReplacingImageUrls /
TestReplacingLinksUrls / TestReplacingQueryStringLinkUrls), run against both
the scalar helper and the full pipeline."""

import pytest

from nreadspark.kernel import transcode
from nreadspark.spans import extract_spans
from nreadspark.urlutil import find_base_url, resolve_element_url

DUMMY_PARAGRAPHS = (
    "<p>Lorem ipsum dolor et amet. Lorem ipsum dolor et amet. Lorem ipsum dolor et "
    "amet. Lorem ipsum dolor et amet.</p>" * 5
)

IMAGE_URL_CASES = [
    ("http://example.com/image.jpg", "http://immortal.pl/doc.html", "http://example.com/image.jpg"),
    ("https://example.com/image.jpg", "http://immortal.pl", "https://example.com/image.jpg"),
    ("ftp://example.com/image.jpg", "http://immortal.pl/doc.html", "ftp://example.com/image.jpg"),
    (
        "A(*Sf6as7f 9A*(659A^SF 6987aSF",
        "http://immortal.pl/",
        "http://immortal.pl/A(*Sf6as7f 9A*(659A^SF 6987aSF",
    ),
    (
        "file:///C:/Users/Administrator/image.jpg",
        "http://immortal.pl/index.html",
        "file:///C:/Users/Administrator/image.jpg",
    ),
    ("image.png", "p//immortal.pl/", "image.png"),
    ("image.png", "AS&F*(^ASF", "image.png"),
    ("image.jpg", "http://immortal.pl", "http://immortal.pl/image.jpg"),
    ("image.jpg", "http://immortal.pl/index.html", "http://immortal.pl/image.jpg"),
    ("/image.jpg", "http://immortal.pl", "http://immortal.pl/image.jpg"),
    ("/image.jpg", "http://immortal.pl/", "http://immortal.pl/image.jpg"),
    ("static/gfx/image.gif", "http://immortal.pl", "http://immortal.pl/static/gfx/image.gif"),
    ("static/gfx/image.gif", "http://immortal.pl/", "http://immortal.pl/static/gfx/image.gif"),
    ("/static/gfx/image.gif", "http://immortal.pl", "http://immortal.pl/static/gfx/image.gif"),
    ("/static/gfx/image.gif", "http://immortal.pl/", "http://immortal.pl/static/gfx/image.gif"),
    (
        "/static/gfx/image.gif",
        "http://immortal.pl/article/doc.html",
        "http://immortal.pl/static/gfx/image.gif",
    ),
    ("static/gfx/image.gif", "http://immortal.pl/article", "http://immortal.pl/static/gfx/image.gif"),
    (
        "static/gfx/image.gif",
        "http://immortal.pl/article/",
        "http://immortal.pl/article/static/gfx/image.gif",
    ),
    (
        "/static/gfx/image.gif",
        "http://immortal.pl/article/doc.html?someParam=1",
        "http://immortal.pl/static/gfx/image.gif",
    ),
    ("image.png", "http://immortal.pl/article/doc.html", "http://immortal.pl/article/image.png"),
    ("/image.png", "http://immortal.pl/article/doc.html", "http://immortal.pl/image.png"),
    (
        "image.png",
        "http://immortal.pl/article/doc.html?someKey=some/Value?aksd",
        "http://immortal.pl/article/image.png",
    ),
    (
        "/image.png",
        "http://immortal.pl/article/doc.html?someKey=some/Value?aksd",
        "http://immortal.pl/image.png",
    ),
    ("image.png", "immortal.pl/article/doc.html?someKey=some/Value?aksd", "image.png"),
    ("image.png", "htt//immortal.pl/arti", "image.png"),
    ("image.png", "http:immortal.pl", "image.png"),
    ("image.png", "/immortal.pl", "image.png"),
]


@pytest.mark.parametrize("src,base,expected", IMAGE_URL_CASES)
def test_resolve_element_url_scalar(src, base, expected):
    assert resolve_element_url(src, base) == expected


@pytest.mark.parametrize(
    "src,base,expected",
    [c for c in IMAGE_URL_CASES],
)
def test_image_url_resolution_through_pipeline(src, base, expected):
    html = (
        "<html><body>"
        + DUMMY_PARAGRAPHS
        + f'<p><img src="{src}" /></p>'
        + DUMMY_PARAGRAPHS
        + "</body></html>"
    )
    result = transcode(html, base)
    assert result.content_extracted
    spans = extract_spans(result.article_content)
    image_refs = [s["media_ref"] for s in spans if s["kind"] == "image"]
    assert expected in image_refs


def test_mailto_passthrough():
    assert resolve_element_url("mailto:x@y.z", "http://a.b/c") == "mailto:x@y.z"
    assert resolve_element_url("  mailto : x@y.z", "http://a.b/c") == "  mailto : x@y.z"


def test_query_string_link_resolution():
    assert (
        resolve_element_url("?hello", "http://wikipedia.org/wiki/baseArticle")
        == "http://wikipedia.org/wiki/baseArticle?hello"
    )
    assert (
        resolve_element_url("?hello", "http://wikipedia.org/wiki/baseArticle?goodbye")
        == "http://wikipedia.org/wiki/baseArticle?hello"
    )


def test_relative_link_resolution_through_pipeline():
    html = (
        "<html><body>"
        + DUMMY_PARAGRAPHS
        + '<p><a href="/wiki/article1">link</a></p>'
        + DUMMY_PARAGRAPHS
        + "</body></html>"
    )
    result = transcode(html, "http://wikipedia.org/wiki/baseArticle")
    assert result.content_extracted
    hrefs = [
        a.get_attribute("href")
        for a in result.article_content.elements_by_tag_name("a")
    ]
    assert "http://wikipedia.org/wiki/article1" in hrefs


def test_find_base_url():
    # the page-number regex strips only the numeric suffix (cs:661-666)
    assert (
        find_base_url("http://example.com/articles/story/page-2")
        == "http://example.com/articles/story/page"
    )
    # a purely numeric trailing segment is dropped entirely (cs:669)
    assert (
        find_base_url("http://example.com/articles/story/2")
        == "http://example.com/articles/story"
    )
    assert find_base_url("not a url") == "not a url"
    # EW-CMS ",00" hack
    base = find_base_url("http://www.ew.com/ew/article/0,,20313460_20369436,00.html")
    assert ",00" not in base
