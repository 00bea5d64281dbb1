"""Layer-4 helper-test ports (SURVEY §5): SgmlDomBuilderTests,
DomExtensionsTests (GetInnerHtml/SetInnerHtml/GetAttributesString),
HtmlUtilsTests, EnumerableExtensionsTests-equivalents.

Reference files under NReadability.Tests/ cited per test.
"""

from __future__ import annotations

import pytest

from nreadspark.dom import (
    Node,
    build_document,
    inner_html,
    remove_script_tags,
    serialize_node,
    set_inner_html,
)

# ---------------------------------------------------------------------------
# SgmlDomBuilderTests.cs
# ---------------------------------------------------------------------------


def test_build_dom_with_html_entities():
    """SgmlDomBuilderTests.cs:25-32: &raquo; decodes to the character."""
    doc = build_document("<html><head></head><body>&raquo;</body></html>")
    assert "»" in serialize_node(doc.root)


def test_builder_handles_invalid_entity_references():
    """SgmlDomBuilderTests.cs:49-54: '&#' must not blow up the round trip."""
    doc = build_document("<p>&#</p>")
    serialize_node(doc.root)  # must not raise


def test_builder_produces_single_html_root_for_real_wordpress_head():
    """SgmlDomBuilderTests.cs:34-47 (Builder_handles_UTF16): a messy real
    head with scripts/styles/links yields exactly one <html> element."""
    html = (
        '﻿<!DOCTYPE html PUBLIC "x">\n<html dir="ltr" lang="pl-PL">\n<head>'
        '<meta http-equiv="Content-Type" content="text/html; charset=UTF-8" />'
        "<title>Jak zwiększyć swoją pewność siebie | Michalpasterski.pl</title>"
        "<script type='text/javascript' src='http://x/jquery.js'></script>"
        "<style>.gsc-control { width: 280px; }</style>"
        '<link rel="stylesheet" href="http://x/style.css" type="text/css" />'
        "</head>\n<body>Some body</body></html>"
    )
    out = serialize_node(build_document(html).root)
    assert out.count("<html") == 1
    assert "Some body" in out


# ---------------------------------------------------------------------------
# HtmlUtilsTests.cs (RemoveScriptTags)
# ---------------------------------------------------------------------------


def test_remove_script_tags_invalid_and_empty():
    """HtmlUtilsTests.cs:10-20."""
    assert remove_script_tags("") == ""


def test_remove_script_tags_no_scripts():
    """HtmlUtilsTests.cs:22-29."""
    html = "<html><p>X</p></html>"
    assert remove_script_tags(html) == html


def test_remove_script_tags_empty_script():
    """HtmlUtilsTests.cs:31-39."""
    assert remove_script_tags("<html><script></script></html>") == "<html></html>"


def test_remove_script_tags_multiline_script():
    """HtmlUtilsTests.cs:41-49."""
    assert (
        remove_script_tags("<html>\r\n  <script>\r\n  var x = 1;\r\n  </script>\r\n</html>")
        == "<html>\r\n  \r\n</html>"
    )


def test_remove_script_tags_script_at_end():
    """HtmlUtilsTests.cs:51-59."""
    assert remove_script_tags("<script>\r\n  var x = 1;\r\n  </script>") == ""


def test_remove_script_tags_multiple_scripts():
    """HtmlUtilsTests.cs:61-69."""
    assert (
        remove_script_tags(
            '<html><script type="text/javascript"></script><p>X</p><script></script></html>'
        )
        == "<html><p>X</p></html>"
    )


# ---------------------------------------------------------------------------
# DomExtensionsTests.cs (GetInnerHtml / SetInnerHtml / GetAttributesString)
# ---------------------------------------------------------------------------


def _div_with(fragment: str) -> Node:
    doc = build_document(f"<html><body><div id='t'>{fragment}</div></body></html>")
    return next(doc.root.elements_by_tag_name("div"))


def test_get_inner_html_text():
    """DomExtensionsTests.cs:78-85."""
    el = _div_with("text1\r\ntext2")
    assert inner_html(el) == "text1\r\ntext2"


def test_get_inner_html_html():
    """DomExtensionsTests.cs:96-103."""
    el = _div_with("text1<p>text2</p>text3")
    assert inner_html(el) == "text1<p>text2</p>text3"


def test_set_inner_html_text():
    """DomExtensionsTests.cs:114-123."""
    el = Node("div")
    set_inner_html(el, "text")
    assert inner_html(el) == "text"


def test_set_inner_html_html():
    """DomExtensionsTests.cs:136-145."""
    el = Node("div")
    set_inner_html(el, "text1<p>text2</p>text3")
    assert inner_html(el) == "text1<p>text2</p>text3"


def test_set_inner_html_entity_amp():
    """DomExtensionsTests.cs:158-167: '&amp;' round-trips to contain '&'."""
    el = Node("div")
    set_inner_html(el, "&amp;")
    assert "&" in inner_html(el)


def test_set_inner_html_entity_raquo():
    """DomExtensionsTests.cs:169-178: '&raquo;' decodes to the character."""
    el = Node("div")
    set_inner_html(el, "&raquo;")
    assert "»" in inner_html(el)


def test_attributes_string_no_attrs():
    """DomExtensionsTests.cs:41-47."""
    assert Node("div").attributes_string("|") == ""


def test_attributes_string_single_and_multiple():
    """DomExtensionsTests.cs:49-76: non-empty values joined by separator."""
    el = Node("div", {"a": "1"})
    assert el.attributes_string("|") == "1"
    el2 = Node("div", {"a": "1", "b": "2", "c": ""})
    assert el2.attributes_string("|") == "1|2"


# ---------------------------------------------------------------------------
# EnumerableExtensions.SingleOrNone equivalents (used by F9 collapse,
# EnumerableExtensions.cs:12-41): our kernel expresses this as direct
# single-child checks; assert the collapse behaves per the helper contract.
# ---------------------------------------------------------------------------


def test_single_or_none_semantics_via_collapse():
    """EnumerableExtensionsTests.cs:13-36 + NReadabilityTranscoderTests
    collapse cases: exactly-one-child collapses, zero or many do not."""
    from nreadspark.kernel import collapse_redundant_paragraph_divs

    doc = build_document(
        "<html><body>"
        "<div id='one'><p>only, child, here</p></div>"
        "<div id='many'><p>a</p><p>b</p></div>"
        "<div id='zero'></div>"
        "</body></html>"
    )
    collapse_redundant_paragraph_divs(doc)
    out = serialize_node(doc.root)
    assert '<div id="one">' not in out  # collapsed into its <p>
    assert '<div id="many">' in out
    assert '<div id="zero"' in out  # serializes self-closed when empty
