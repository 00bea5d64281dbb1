"""A/B parity: the fast single-pass tokenizer must build byte-identical
trees to the stdlib html.parser front-end on every vendored fixture (16
single-page + 29 multi-page real web pages) and on fuzzed documents."""

from __future__ import annotations

import glob
import os

import pytest
from hypothesis import given, settings, strategies as st

from nreadspark.dom import _parse_nodes_fast, _parse_nodes_stdlib, serialize_node

FIXTURE_GLOBS = [
    os.path.join(os.path.dirname(__file__), "fixtures", "sample_input", "*.html"),
    os.path.join(os.path.dirname(__file__), "fixtures", "sample_web_input", "*.html"),
]
FIXTURES = sorted(f for g in FIXTURE_GLOBS for f in glob.glob(g))


def _tree_string(nodes) -> str:
    return "".join(serialize_node(n) for n in nodes)


@pytest.mark.parametrize("path", FIXTURES, ids=[os.path.basename(p) for p in FIXTURES])
def test_fast_parser_matches_stdlib_on_fixture(path):
    html = open(path, encoding="utf-8", errors="replace").read()
    fast = _tree_string(_parse_nodes_fast(html))
    std = _tree_string(_parse_nodes_stdlib(html))
    assert fast == std


_CHUNKS = [
    "<div>", "</div>", "<p class='a b'>", "</p>", "<br>", "<br/>", "<img src=x>",
    "text here", "a &amp; b", "&nbsp;", "&#65;", "&#xGG;", "&unknown;", "<",
    ">", "</", "<!-- comment -->", "<!--unclosed", "<!DOCTYPE html>", "<!bogus>",
    "<?pi?>", "<script>var a = '<div>' < 3;</script>", "<script>no close",
    "<style>p { color: red }</style>", "<SPAN CLASS=UPPER>", "</span junk>",
    "</>", "<3 not a tag", "<a href='x' checked>", "<a href=\"y\" />",
    "<td>cell<td>next", "<li>one<li>two", "<em", "<em foo", "<em foo=",
    "<em foo='bar", "\n\t ", "mixed < text & stuff >",
]


@settings(max_examples=150, deadline=None)
@given(st.lists(st.sampled_from(_CHUNKS), min_size=0, max_size=25))
def test_fast_parser_matches_stdlib_on_fuzzed_docs(chunks):
    html = "".join(chunks)
    try:
        std = _tree_string(_parse_nodes_stdlib(html))
    except Exception:
        return  # stdlib itself chokes: build_document's retry path owns this
    fast = _tree_string(_parse_nodes_fast(html))
    assert fast == std


@settings(max_examples=60, deadline=None)
@given(st.text(alphabet="<>/&;!?-=\"' abcdefp123#x", max_size=120))
def test_fast_parser_matches_stdlib_on_tag_soup(text):
    try:
        std = _tree_string(_parse_nodes_stdlib(text))
    except Exception:
        return
    fast = _tree_string(_parse_nodes_fast(text))
    assert fast == std
