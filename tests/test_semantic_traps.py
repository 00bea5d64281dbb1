"""One named test per SURVEY §4.3 semantic trap — the places where a
careless reimplementation of the reference silently diverges.

Trap numbers refer to SURVEY.md §4.3; reference lines cited per test.
"""

from __future__ import annotations

from nreadspark.dom import Node, build_document, set_inner_html
from nreadspark.kernel import (
    Options,
    clean,
    create_article_content_element,
    determine_top_candidate,
    find_candidates_for_article_content,
    get_segments_count,
    strip_unlikely_candidates,
    transcode,
)
from nreadspark.spans import extract_spans, flatten_spans_text


def _score_of(doc, el_id, candidates, scores):
    el = doc.get_element_by_id(el_id)
    assert el is not None
    return scores.get(id(el), 0.0)


def test_trap1_grandparent_rollup_uses_integer_division():
    """§4.3.1 (cs:1072): grandparent += score // 2, never score / 2."""
    text = "word " * 25  # >= 100 chars, 0 commas -> score = 1 + 1 + 1 = 3
    doc = build_document(
        f"<html><body><div id='gp'><div id='par'><p>{text}</p></div></div></body></html>"
    )
    candidates, scores = find_candidates_for_article_content(doc, Options())
    assert _score_of(doc, "par", candidates, scores) == 3
    assert _score_of(doc, "gp", candidates, scores) == 1  # 3 // 2, not 1.5


def test_trap2_segments_count_is_count_plus_one():
    """§4.3.2 (cs:1296)."""
    assert get_segments_count("", ",") == 1
    assert get_segments_count("a,b,c", ",") == 3


def test_trap3_top_candidate_tie_break_keeps_first_in_document_order():
    """§4.3.3 (cs:1093-1097): strictly-greater comparison -> first max wins."""
    p = "equal paragraph text, with a comma, that is long enough to score."
    doc = build_document(
        f"<html><body><div id='main'>"
        f"<div id='first'><p>{p}</p></div>"
        f"<div id='second'><p>{p}</p></div>"
        f"</div></body></html>"
    )
    candidates, scores = find_candidates_for_article_content(doc, Options())
    first = doc.get_element_by_id("first")
    second = doc.get_element_by_id("second")
    assert scores[id(first)] == scores[id(second)]
    top = determine_top_candidate(doc, candidates, scores, Options())
    assert top.get_id() == "first"


def test_trap4_ok_maybe_regex_contains_literal_and():
    """§4.3.4 (cs:104): any class containing 'and' (e.g. 'standard') is
    protected from unlikely-candidate stripping."""
    doc = build_document(
        "<html><body>"
        "<div id='gone' class='sidebar'><p>a</p></div>"
        "<div id='kept' class='sidebar standard'><p>b</p></div>"
        "</body></html>"
    )
    strip_unlikely_candidates(doc, Options())
    assert doc.get_element_by_id("gone") is None
    assert doc.get_element_by_id("kept") is not None


def test_trap5_anchor_tags_survive_unlikely_stripping():
    """§4.3.5 (cs:940): tag 'a' exempt even with an unlikely class."""
    doc = build_document(
        "<html><body><a id='link' class='sidebar' href='/x'>x</a></body></html>"
    )
    strip_unlikely_candidates(doc, Options())
    assert doc.get_element_by_id("link") is not None


def test_trap6_cleaning_sees_clone_identities_not_scoring_scores():
    """§4.3.6 refined: CreateArticleContentElement adds siblings via
    XContainer.Add, which CLONES parented nodes (LINQ-to-XML), so
    CleanConditionally's score lookups (cs:1436) miss for every cleaned
    element -- a negative-class-weight table is removed even though the
    scoring pass gave its original a large score.  The kernel models the
    clone identity gap by clearing the score table before cleaning
    (kernel.extract_article_content)."""
    rich = ("clause, " * 25) + "end of a long comma rich paragraph for scoring."
    filler = ("text, " * 30) + "main content paragraph that outranks everything else here."
    html = (
        "<html><body><div id='main'>"
        f"<p>{filler}</p><p>{filler}</p>"
        f"<table class='widget' id='tbl'><p>{rich}</p></table>"
        "</div></body></html>"
    )
    doc = build_document(html)
    candidates, scores = find_candidates_for_article_content(doc, Options())
    tbl = doc.get_element_by_id("tbl")
    assert scores[id(tbl)] >= 25  # the scoring pass DID score the table...
    result = transcode(html, None, Options())
    text = flatten_spans_text(extract_spans(result.article_content))
    # ...but cleaning sees clones: weight('widget') = -25 + score 0 < 0
    assert "end of a long comma rich paragraph" not in text
    assert "main content paragraph" in text


def test_trap7_fallback_rerun_is_a_full_rerun_without_stripping():
    """§4.3.7 (cs:369-382): <250 chars extracted with stripping on -> rerun
    with _dontStripUnlikelys; unlikely-classed content then extractable."""
    html = (
        "<html><head><title>Sparse | Site</title></head><body>"
        "<div class='sidebar'><p>short, but real, content sentence here.</p></div>"
        "</body></html>"
    )
    result = transcode(html, None, Options())
    assert result.metrics["fallback_rerun"] is True
    text = flatten_spans_text(extract_spans(result.article_content))
    assert "short, but real, content sentence here." in text


def test_trap8_nbsp_only_text_survives_xml_whitespace_drop():
    """§4.3.8 (SgmlDomBuilder.cs:99): WhitespaceHandling.None drops nodes of
    XML whitespace (space/tab/CR/LF); U+00A0 from &nbsp; is NOT XML ws."""
    doc = build_document("<html><body><div id='a'>&nbsp;</div><div id='b'>   \r\n</div></body></html>")
    a = doc.get_element_by_id("a")
    b = doc.get_element_by_id("b")
    assert a.value == "\xa0"
    assert b.children == []


def test_trap9_set_inner_html_decodes_entities_like_a_reparse():
    """§4.3.9 (DomExtensions.cs:252 + NReadabilityTranscoderTests.cs:519-521):
    SetInnerHtml routes through the SGML parser, so &nbsp; becomes U+00A0."""
    el = Node("div")
    set_inner_html(el, "a&nbsp;b")
    assert el.value == "a\xa0b"


def test_trap10_video_exemption_is_http_only():
    """§4.3.10 (cs:114): the video regex matches http:// only -- an https
    youtube embed is NOT exempt from Clean(object/embed)."""
    doc = build_document(
        "<html><body><div id='c'>"
        "<embed id='keep' src='http://www.youtube.com/v/abc' />"
        "<embed id='drop' src='https://www.youtube.com/v/abc' />"
        "</div></body></html>"
    )
    container = doc.get_element_by_id("c")
    clean(container, "embed")
    assert doc.get_element_by_id("keep") is not None
    assert doc.get_element_by_id("drop") is None


def test_trap11_sibling_threshold_is_a_minimum_of_ten():
    """§4.3.11 (cs:1136-1139): _MaxSiblingScoreTreshold is a floor of 10
    despite the 'Max' name: with a small top score, a sibling scoring >= 10
    merges, one scoring 9 does not."""
    big = ("seg, " * 30) + ("pad " * 30) + "top paragraph long enough to dominate scoring."
    s11 = "a, b, c, d, e, f, g, h, i, j short."  # 9 commas, < 100 chars -> 11
    s9 = "a, b, c, d, e, f, g tiny."  # 6 commas -> score 8
    doc = build_document(
        "<html><body><div id='main'>"
        f"<div id='top'><p>{big}</p></div>"
        f"<div id='s11'><p>{s11}</p></div>"
        f"<div id='s9'><p>{s9}</p></div>"
        "</div></body></html>"
    )
    opts = Options()
    candidates, scores = find_candidates_for_article_content(doc, opts)
    s11_el = doc.get_element_by_id("s11")
    s9_el = doc.get_element_by_id("s9")
    assert scores[id(s11_el)] == 11
    assert scores[id(s9_el)] == 8
    top = determine_top_candidate(doc, candidates, scores, opts)
    assert top.get_id() == "top"
    assert scores[id(top)] * 0.2 < 10  # the floor, not 0.2*top, is binding
    article = create_article_content_element(doc, top, scores, opts)
    ids = [c.get_id() for c in article.children if c.is_element]
    assert "s11" in ids
    assert "s9" not in ids
