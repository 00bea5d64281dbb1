"""Multi-page parity against the reference's own web-transcoder test corpus.

Port of NReadabilityWebTranscoderTests.TestSampleInputs
(NReadabilityWebTranscoderTests.cs:138-271): 11 saved multi-page articles
(SampleWebInput/SampleInput_NN_M.html) crawled through a file-based fetcher
stub (FileBasedUrlFetcherStub.cs:1-44).  Content probes assert page-2+ text
present and false-positive pagination absent; the duplicate-page case (4)
asserts its probe appears exactly once.  The reference's title-duplication
count probes target the serialized full document (title + per-page h1
handling in GlueDocument) and are not meaningful for the span-sequence
output, so they are not ported.
"""

from __future__ import annotations

import os

import pytest

from nreadspark.multipage import transcode_web
from nreadspark.spans import flatten_spans_text

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures", "sample_web_input")

# NReadabilityWebTranscoderTests.cs:35-135
URLS = {
    1: [
        "http://www.nytimes.com/2010/11/14/world/asia/14myanmar.html?hp",
        "http://www.nytimes.com/2010/11/14/world/asia/14myanmar.html?pagewanted=2&hp",
    ],
    2: [
        "http://www.vanityfair.com/politics/features/2010/12/unbroken-excerpt-201012",
        "http://www.vanityfair.com/politics/features/2010/12/unbroken-excerpt-201012?currentPage=2",
        "http://www.vanityfair.com/politics/features/2010/12/unbroken-excerpt-201012?currentPage=3",
    ],
    3: [
        "http://www.theatlantic.com/magazine/archive/2010/12/dirty-coal-clean-future/8307",
        "http://www.theatlantic.com/magazine/archive/2010/12/dirty-coal-clean-future/8307/2",
        "http://www.theatlantic.com/magazine/archive/2010/12/dirty-coal-clean-future/8307/3",
    ],
    4: [
        "http://www.slate.com/id/2275733",
        "http://www.slate.com/id/2275733/pagenum/2",
    ],
    5: [
        "http://entertainment.howstuffworks.com/leisure/brain-games/scrabble.htm",
        "http://entertainment.howstuffworks.com/leisure/brain-games/scrabble1.htm",
        "http://entertainment.howstuffworks.com/leisure/brain-games/scrabble2.htm",
        "http://entertainment.howstuffworks.com/leisure/brain-games/scrabble3.htm",
        "http://entertainment.howstuffworks.com/leisure/brain-games/scrabble4.htm",
    ],
    6: [
        "http://www.slate.com/articles/technology/technology/2011/10/steve_jobs_biography_the_new_book_doesn_t_explain_what_made_the_.html",
        "http://www.slate.com/articles/technology/technology/2011/10/steve_jobs_biography_the_new_book_doesn_t_explain_what_made_the_.2.html",
    ],
    7: [
        "http://www.brookings.edu/opinions/2011/0523_transit_berube_puentes.aspx",
        "http://www.brookings.edu/opinions/2011/0524_nextwave_west.aspx",  # false positive
    ],
    8: [
        "http://mashable.com/2008/10/30/slow-feed-movement-rss",
        "http://mashable.com/2008/10/30/indecision2008-live-chat",  # false positive
    ],
    9: [
        "http://www.sparknotes.com/lit/mocking/section1.rhtml",
        "http://www.sparknotes.com/lit/mocking/section2.rhtml",
    ],
    10: [
        "http://www.gamasutra.com/view/feature/175210/the_ins_and_outs_of_native_client.php",
        "http://www.gamasutra.com/view/feature/175210/the_ins_and_outs_of_native_client.php?page=2",
        "http://www.gamasutra.com/view/feature/175210/the_ins_and_outs_of_native_client.php?page=3",
    ],
    11: [
        "http://www.gamasutra.com/view/feature/177676/The_Media_Molecule_Identity.php",
        "http://www.gamasutra.com/view/feature/177676/the_media_molecule_identity.php?page=2",
        "http://www.gamasutra.com/view/feature/177676/the_media_molecule_identity.php?page=3",
    ],
}

# content probes from NReadabilityWebTranscoderTests.cs:170-268
MUST_CONTAIN = {
    1: [
        " freedom of movement or expression would constitute a new and unacceptable denial",
        "Those expectations were on display in the crowd outside her house on Saturday.",
    ],
    2: [
        "For Louie and Phil, the conversations did more than keep their minds sharp.",
        "A serial runaway and artful dodger",
    ],
    3: [
        "The Chinese system as a whole has great weaknesses as well as great strengths.",
        " This emphasis on limits is what begins pointing us back to coal.",
    ],
    5: [
        "How can you take your game to the next level? Let's start by looking at game play.",
        "The object of Scrabble is to get the most points by creating words.",
        "To determine who goes first, put all the tiles into the bag and mix them up.",
        "If you play often enough, you'll need to learn how to play the board in order to get the highest score",
        "Many people play Scrabble on a traditional flat board with the grid imprinted on it.",
    ],
    6: [
        "In the aftermath of his resignation and then his death",
        "Jobs also seemed to suspect that he",
        "And, sadly, it may remain one forever.",
    ],
    7: [
        "post also betrays some misconceptions regarding our report.",
        "After all, none of us can resist the occasional study",
    ],
    8: [
        "list your favorite tools for slowing down feeds in the comments",
    ],
    9: [
        "The story is narrated by a young girl named Jean Louise",
        "September arrives, and Dill leaves Maycomb to return to",
        "educational technique but the law.",
    ],
    10: [
        "Curious about Native Client",
        "Most games written specifically for PC",
        "The NaCl team is working hard on debugging",
    ],
    11: [
        "Sony press conference at Gamescom",
        "You actually fold",
        "It was the founding thing",
    ],
}

MUST_NOT_CONTAIN = {
    7: [
        "In expressing this view, Clinton joins many Americans who worry about online misinformation, loss of privacy, and identity theft."
    ],
    8: ["signature fake news programs"],
}


def _fetcher(sample: int):
    urls = URLS[sample]

    def fetch(url: str) -> str | None:
        try:
            page_no = urls.index(url) + 1
        except ValueError:
            return None
        path = os.path.join(FIXTURES, f"SampleInput_{sample:02d}_{page_no}.html")
        with open(path, encoding="utf-8", errors="replace") as f:
            return f.read()

    return fetch


@pytest.mark.parametrize("sample", sorted(URLS.keys()))
def test_sample_web_inputs(sample):
    merged = transcode_web(_fetcher(sample), URLS[sample][0])
    assert merged["content_extracted"], f"sample {sample}: nothing extracted"
    text = flatten_spans_text(merged["spans"])
    for probe in MUST_CONTAIN.get(sample, []):
        assert probe in text, f"sample {sample}: missing probe {probe[:60]!r}"
    for probe in MUST_NOT_CONTAIN.get(sample, []):
        assert probe not in text, f"sample {sample}: false-positive page merged"


def test_sample_04_duplicate_page_appears_once():
    """Case 4 (NReadabilityWebTranscoderTests.cs:193-195): page 2 duplicates
    page 1; the merge must keep the probe text exactly once."""
    merged = transcode_web(_fetcher(4), URLS[4][0])
    text = flatten_spans_text(merged["spans"])
    assert text.count("his may seem paradoxical, or backward") == 1
