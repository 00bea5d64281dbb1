"""Parser-parity corpus: the SgmlReader golden test suite.

The reference vendors its entire SGML parser with a golden suite
(``Src/SgmlReader 1.8.7/TestSuite/html.suite``, driven by
``TestSuite/Test.cs:126-194`` -- a line-initial backquote toggles
args/input/expected sections).  On a real crawl the parser is the first
thing hostile HTML hits, so every pathological input in that suite must go
through our ``dom.build_document`` + serializers without crashing, and the
*parse semantics* the expected blocks encode (entity tolerance, implied
end tags, attribute minimization, truncated documents) must hold.

What we assert, per tier:

1. **Totality** -- all 53 cases parse and serialize (compact + pretty),
   no exception, and re-parsing our serialization is stable except for the
   documented raw-text divergence below.
2. **Goldens** -- our compact serialization of every case is frozen in
   ``tests/fixtures/sgml_suite/goldens.json`` so tokenizer changes surface
   as diffs.
3. **Semantic parity** -- where SgmlReader's expected output encodes parse
   behavior (not .NET serialization), we assert the same behavior
   directly: see ``SEMANTIC_CASES``.

Documented intentional divergences from SgmlReader's expected output
(ours follows the HTML5 tokenizer conventions of Python's html.parser;
SgmlReader follows SGML + .NET XML-infoset conventions):

* **raw-text round-trip** (cases 8, 12, 18, 37, 43): we serialize
  ``<script>``/``<style>`` content XML-escaped (``&lt;``), and a re-parse
  treats that content as raw CDATA, yielding double-escaping.  The
  reference's own stack behaves identically (``XDocument.ToString`` writes
  ``&lt;``; SgmlReader re-reads script content as SGML CDATA), and the
  extraction kernel strips script/style before any innerHTML re-parse, so
  the round-trip is never exercised in the pipeline.  Locked in
  ``test_reparse_stability``.
* **`>` inside quoted attribute** (case 1): HTML5 permits ``>`` in a
  quoted attribute value; we keep ``text="foo>bar"``.  SgmlReader ends the
  tag at the ``>`` and spills ``bar"/>`` as text.
* **stray quote after attribute** (case 11): ``href="..."'`` -- we keep
  href AND the following ``title`` attribute (plus a junk ``'`` attribute,
  the html.parser recovery); SgmlReader drops everything after the stray
  quote.
* **unterminated attribute quote** (case 14): ``<script type="text/javascript></script>``
  never closes the quote; we emit the whole construct as text (html.parser
  CDATA recovery), SgmlReader synthesizes a <script> element.
* **non-name tag garbage** (cases 17, 39, 40, 42): ``<something@something.com>``,
  ``<messed_up.< p>``, ``<class="black">``, ``height"4"`` -- we preserve
  the garbage as (unknown, textless) element/attribute names; SgmlReader
  variously text-ifies or repairs them.  Harmless to extraction (no text
  is lost) and locked by the goldens.

SgmlReader-only conventions we deliberately do NOT model: XML namespace
declarations/mangling (``xmlns:st1="#unknown"``, ``_x0032_``), CDATA-
wrapping of script content, ``<?xml:namespace?>`` PI rewriting, and the
indented XmlTextWriter layout -- the extraction kernel operates on tag
names, attributes and text, none of which carry namespace infoset.
"""

import json
import os
import re

import pytest

from nreadspark.dom import build_document, serialize_node, serialize_node_pretty

_FIXTURE_DIR = os.path.join(os.path.dirname(__file__), "fixtures", "sgml_suite")

# serializes-escaped / reparses-raw script+style content (see module doc)
RAWTEXT_ROUNDTRIP_CASES = {8, 12, 18, 37, 43}


def parse_suite(path):
    """The backquote-toggle format of TestSuite/Test.cs:143-163."""
    cases, args, input_lines, expected_lines, current = [], None, [], [], None
    with open(path, encoding="utf-8-sig") as f:
        for line in f:
            if line.startswith("`"):
                if current is None or current == "expected":
                    if current == "expected":
                        cases.append((args, "".join(input_lines), "".join(expected_lines)))
                    args = line[1:].strip()
                    input_lines, expected_lines = [], []
                    current = "input"
                else:
                    current = "expected"
                continue
            (input_lines if current == "input" else expected_lines).append(line)
    if current == "expected":
        cases.append((args, "".join(input_lines), "".join(expected_lines)))
    return cases


CASES = parse_suite(os.path.join(_FIXTURE_DIR, "html.suite"))
with open(os.path.join(_FIXTURE_DIR, "goldens.json")) as _f:
    GOLDENS = json.load(_f)


def _serialize(doc):
    return serialize_node(doc.root) if doc.root is not None else ""


def test_suite_shape():
    """The vendored corpus carries the full reference suite."""
    assert len(CASES) == 53 == len(GOLDENS)
    assert sum(1 for a, _, _ in CASES if "-html" in a) >= 49
    # every case has a non-empty input and (except pure-roundtrip clones)
    # an expected block recorded by the reference
    assert all(inp.strip() for _, inp, _ in CASES)


@pytest.mark.parametrize("idx", range(len(CASES)))
def test_case_parses_and_matches_golden(idx):
    args, inp, _expected = CASES[idx]
    doc = build_document(inp)  # totality: no pathological input may raise
    ser = _serialize(doc)
    golden = GOLDENS[idx]
    assert golden["case"] == idx and golden["args"] == args
    assert ser == golden["serialized"], f"case {idx} [{args}]"
    if doc.root is not None:  # the pretty printer must be total too
        assert serialize_node_pretty(doc.root)


def test_reparse_stability():
    """Parse -> serialize -> parse -> serialize is a fixed point for every
    case except the documented raw-text-element escaping divergence (which
    the reference's .NET stack shares)."""
    unstable = set()
    for idx, (_args, inp, _exp) in enumerate(CASES):
        s1 = _serialize(build_document(inp))
        s2 = _serialize(build_document(s1))
        if s1 != s2:
            unstable.add(idx)
            # the divergence is EXACTLY the &-escaping of already-escaped
            # script/style content, nothing structural
            assert s2 == re.sub(r"&(lt|gt|amp);", r"&amp;\1;", s1), idx
    assert unstable == RAWTEXT_ROUNDTRIP_CASES


# -- semantic parity -------------------------------------------------------
# Each entry: (case index, check) where check asserts the parse semantics
# SgmlReader's expected output encodes.  Serialization conventions are the
# goldens' job; these lock behavior that must survive serializer rewrites.


def _one(doc, tag):
    els = doc.elements_list_by_tag_name(tag)
    assert len(els) == 1, f"expected one <{tag}>, got {len(els)}"
    return els[0]


def check_attr_minimization(doc):  # case 0: <span text /> -> text="text"
    assert _one(doc, "span").get_attribute("text") == "text"


def check_entity_tolerance(doc):  # case 3: &test&nbsp&nbsp -> &test + nbsp
    assert _one(doc, "tag").value == "&test\xa0\xa0 blah blah"


def check_bare_nbsp_run(doc):  # case 4: three semicolon-less &nbsp
    assert _one(doc, "tag").value == "\xa0\xa0\xa0 blah blah"


def check_astral_charref(doc):  # case 5: &#1048576; (plane-16) survives
    assert _one(doc, "span").value == "\U00100000"


def check_bad_xhtml_mixed(doc):  # case 9: This <P>is bad </P> XHTML.
    body = doc.get_body()
    assert body.value == "This is bad  XHTML."
    assert _one(doc, "p").value == "is bad "


def check_apos(doc):  # case 13: &apos; (XML-only entity) -> '
    assert doc.get_body().value == "'"


def check_sup2(doc):  # case 16: &sup2; -> superscript two
    assert doc.get_body().value.strip() == "²"


def check_downlevel_conditional(doc):  # case 22: <![if]>...<![endif]> text kept
    assert doc.get_body().value == "do not lose this text"


def check_title_in_body(doc):  # case 20: <title> inside body stays there
    title = _one(doc, "title")
    assert title.parent.tag == "body"
    assert title.value == "Title"
    # the DOCUMENT title is head-scoped (DomExtensions.cs:50-79): a body
    # title is content, not metadata
    assert doc.get_title_text() == ""
    assert _one(doc, "foo").value == "foo"


def check_table_implied_close(doc):  # case 36: <tr><td>row1<tr><td>row2</td>
    rows = doc.elements_list_by_tag_name("tr")
    assert [r.value for r in rows] == ["row1", "row2"]
    for r in rows:
        assert r.parent.tag == "table"
        assert [c.tag for c in r.child_elements()] == ["td"]


def check_copy_entity(doc):  # case 41: &copy; + self-closed <br/>
    assert _one(doc, "p").value == "©"
    assert not _one(doc, "br").children


def check_doctype_dropped(doc):  # case 44: DOCTYPE + <HTML></HTML> folds to root
    assert doc.root.tag == "html" and not doc.root.children


def check_numeric_charrefs(doc):  # case 48: &#x5a;&#90;&#90 test &#90 -> ZZZ test Z
    assert _one(doc, "p").value == "ZZZ test Z"


def check_unclosed_body(doc):  # case 32: <html><body> EOF
    assert doc.root.tag == "html"
    assert doc.get_body() is not None


def check_bare_html(doc):  # cases 33/34: blank lines + <html> EOF
    assert doc.root.tag == "html" and not doc.root.children


def check_style_bang_dash(doc):  # case 12: <style>\n<!--\n</style> content kept
    assert _one(doc, "style").value == "\n<!--\n"


def check_style_raw_css(doc):  # case 19: css braces preserved verbatim
    assert _one(doc, "style").value == "div.wiki { float: right; }"
    assert _one(doc, "em").value == "foo"


def check_fragment_with_text(doc):  # case 46 (-testdoc): wrapper keeps text
    assert doc.root.tag == "html"
    assert doc.root.value == "blah foo"
    assert _one(doc, "b").value == "foo"


def check_fragment_with_comment(doc):  # case 47: leading comment preserved
    assert doc.root.tag == "html"
    assert any(n.is_comment and "top" in n.value for n in doc.root.children)
    assert _one(doc, "b").value == "foo"


def check_unquoted_attr(doc):  # case 42: width= 2 (unquoted, spaced) parses
    img = _one(doc, "img")
    assert img.get_attribute("src") == "img.gif"
    assert img.get_attribute("width") == "2"


def check_unclosed_head_title(doc):  # case 51: <head><title>text EOF
    assert doc.get_title_text() == "Welcome to MSN.com"


SEMANTIC_CASES = [
    (0, check_attr_minimization),
    (3, check_entity_tolerance),
    (4, check_bare_nbsp_run),
    (5, check_astral_charref),
    (9, check_bad_xhtml_mixed),
    (12, check_style_bang_dash),
    (13, check_apos),
    (16, check_sup2),
    (19, check_style_raw_css),
    (20, check_title_in_body),
    (22, check_downlevel_conditional),
    (32, check_unclosed_body),
    (33, check_bare_html),
    (34, check_bare_html),
    (36, check_table_implied_close),
    (41, check_copy_entity),
    (42, check_unquoted_attr),
    (44, check_doctype_dropped),
    (46, check_fragment_with_text),
    (47, check_fragment_with_comment),
    (48, check_numeric_charrefs),
    (51, check_unclosed_head_title),
]


@pytest.mark.parametrize("idx,check", SEMANTIC_CASES, ids=lambda v: getattr(v, "__name__", v))
def test_semantic_parity(idx, check):
    check(build_document(CASES[idx][1]))


# -- documented divergences (locked so silent drift gets noticed) ----------


def test_divergence_gt_in_quoted_attr():
    """Case 1: HTML5 keeps '>' inside a quoted value; SgmlReader ends the
    tag there (expected: text='foo' + spilled text 'bar\"/>')."""
    doc = build_document(CASES[1][1])
    assert _one(doc, "span").get_attribute("text") == "foo>bar"
    assert doc.get_body().value == ""


def test_divergence_stray_quote_keeps_later_attrs():
    """Case 11: SgmlReader drops title after the stray quote; we keep it."""
    a = _one(build_document(CASES[11][1]), "a")
    assert a.get_attribute("href") == "http://www.cnn.com/"
    assert a.get_attribute("title") == "cnn.com"
    assert a.value == "cnn"


def test_divergence_unterminated_quote_is_text():
    """Case 14: SgmlReader makes a <script> element; we keep the broken
    construct as visible text (nothing is silently dropped)."""
    doc = build_document(CASES[14][1])
    assert not doc.elements_list_by_tag_name("script")
    assert "script type=" in doc.root.value


def test_divergence_email_like_tag_is_element():
    """Case 17: SgmlReader text-ifies <something@something.com>; we keep it
    as an (empty, unknown) element -- no text content either way."""
    doc = build_document(CASES[17][1])
    el = _one(doc, "something@something.com")
    assert el.value == "" and not el.children


def test_bom_and_messy_head_yield_single_root():
    """SgmlReaderDll9.Tests/SgmlReaderTests.cs:44 (Builder_handles_UTF16):
    a BOM-prefixed page with a messy real-world head -- DOCTYPE with PUBLIC
    ids, single-quoted and entity-bearing attributes, comments, styles with
    CSS braces, scripts with nested quotes -- must produce exactly ONE
    <html> element (no synthetic wrapper duplicating the root)."""
    html = (
        "﻿<!DOCTYPE html PUBLIC \"-//W3C//DTD XHTML 1.0 Transitional//EN\" "
        "\"http://www.w3.org/TR/xhtml1/DTD/xhtml1-transitional.dtd\">\n"
        "<html xmlns=\"http://www.w3.org/1999/xhtml\" dir=\"ltr\" lang=\"pl-PL\">\n"
        "<head profile=\"http://gmpg.org/xfn/11\">\n"
        "<meta http-equiv=\"Content-Type\" content=\"text/html; charset=UTF-8\" />\n"
        "<title>Pewność siebie | blog</title>\n"
        "<meta name=\"generator\" content=\"WordPress abc\" /> <!-- leave this for stats -->\n"
        "<link rel='stylesheet' id='wp-polls-css' href='http://example.pl/polls.css?ver=2.50' media='all' />\n"
        "<link rel=\"alternate\" title=\"komentarze &raquo; kanał\" href=\"http://example.pl/feed/\" />\n"
        "<script type='text/javascript' src='http://example.pl/js.js?a=1&amp;b=2'></script>\n"
        "<style>\t.gsc-control {\n\t  width: 280px;\n\t\toverflow: hidden\n\t}\n</style>\n"
        "<script type='text/javascript'>\nfunction OnLoad()\n{\n  var s = \"it's\";\n}\n</script>\n"
        "<style type=\"text/css\">.pollbar { background-image: url('http://example.pl/bg.gif'); }</style>\n"
        "</head>\n<body>Some body</body></html>"
    )
    doc = build_document(html)
    assert doc.root.tag == "html" and doc.root.parent is None
    assert len(doc.elements_list_by_tag_name("html")) == 1
    assert _serialize(doc).count("<html") == 1
    assert doc.get_body().value == "Some body"
    assert doc.get_title_text() == "Pewność siebie | blog"
