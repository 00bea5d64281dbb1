"""Locks for the THREE sample cases the reference itself disables
(NReadabilityTranscoderTests.cs:453-456: case 7 commented out of the
[Values(...)] list with "TODO: if time, add test case 7 (the sample is
already in the repo but needs fixing)"; cases 12/13 removed with "TODO IMM
HI: uncomment tests 12, 13" and their probe blocks at cs:615-649 each
carry "TODO IMM HI: fix (problem with nested divs)").

This engine reproduces the reference's nested-div behavior on 12/13: the
article's OPENING paragraph sits in a nested div that the scoring pass
drops, while every later paragraph extracts -- so the first-paragraph
probes are strict xfails (shared, documented divergence) and the
rest-of-article probes are plain passing locks.  Case 7 has no probe block
in the reference at all; our from-scratch engine extracts that article
end-to-end, locked as an explicit plain-pass divergence test.
"""

import os

import pytest

from nreadspark import extract_document
from nreadspark.spans import flatten_spans_text

FIXTURES = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")

# the reference's own probe strings for cases 12/13 (cs:616-631 / cs:634-649)
_FIRST_PARAGRAPH = "One of the supreme ironies among the European moral stances"
_REST_OF_ARTICLE = [
    "And yet when that same Europe turns its gaze on the Middle East",
    "Normally, this would not be even worth mentioning.",
    "Israel first outlawed the death penalty in 1954",
    "If the Israelis had hundreds of terrorists",
    "It may seem cost-free to Westerners",
]
_URL_12 = (
    "http://www.telegraph.co.uk/comment/personal-view/8841737/"
    "What-Gilad-Shalit-tells-us-about-the-respect-for-life-in-"
    "Europe-Israel-and-Palestine.html"
)


def _extract_text(num: str, url: str) -> str:
    path = os.path.join(FIXTURES, "sample_input", f"SampleInput_{num}.html")
    with open(path, encoding="utf-8", errors="replace") as fh:
        html = fh.read()
    result = extract_document(html, url)
    assert result["content_extracted"]
    return flatten_spans_text(result["spans"])


@pytest.mark.parametrize(
    "num,url",
    [("12", _URL_12), ("13", "http://www.instapaper.com/text?u=" + _URL_12)],
)
def test_disabled_samples_rest_of_article_extracts(num, url):
    """Everything AFTER the nested-div opening extracts on both variants --
    the divergence is confined to the first paragraph."""
    text = _extract_text(num, url)
    missing = [p for p in _REST_OF_ARTICLE if p not in text]
    assert not missing, f"sample {num}: probes missing: {missing[:3]}"


@pytest.mark.parametrize(
    "num,url",
    [("12", _URL_12), ("13", "http://www.instapaper.com/text?u=" + _URL_12)],
)
@pytest.mark.xfail(
    strict=True,
    reason="shared with the reference: NReadabilityTranscoderTests.cs:615,633 "
    "'TODO IMM HI: fix (problem with nested divs)' -- the opening paragraph "
    "lives in a nested div the scoring pass drops; the reference disables "
    "cases 12/13 for the same reason (cs:454-456)",
)
def test_disabled_samples_nested_div_first_paragraph(num, url):
    assert _FIRST_PARAGRAPH in _extract_text(num, url)


def test_disabled_sample_07_extracts_article():
    """EXPLICIT divergence lock: the reference never enabled case 7
    (NReadabilityTranscoderTests.cs:453 comments it out of the [Values]
    list -- "TODO: if time, add test case 7 (the sample is already in the
    repo but needs fixing)" -- and no probe block for it exists anywhere in
    the suite).  This from-scratch engine extracts the article end-to-end,
    i.e. we succeed where the reference's own bug kept the case disabled;
    asserted as a plain pass so a regression to the reference's behavior is
    caught rather than hidden in an xfail/xpass."""
    text = _extract_text("07", "http://nplusonemag.com/treasure-island")
    assert "In June 1985, TV Guide published a cover story" in text
    assert "what holds them together is love." in text or "what holds them together is" in text
