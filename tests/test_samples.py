"""End-to-end corpus tests: the 13 enabled reference sample pages
(NReadabilityTranscoderTests.TestSampleInputs, cs:452-673) checked via
substring probes over the flattened extracted span text, plus frozen
span-sequence goldens (the north rule's (kind, text, media_ref, order)
equality)."""

import json
import os

import pytest

from nreadspark import extract_document
from nreadspark.spans import flatten_spans_text

FIXTURES = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")
GOLDENS = os.path.join(FIXTURES, "goldens")

with open(os.path.join(FIXTURES, "probes.json"), encoding="utf-8") as f:
    PROBES = json.load(f)["samples"]


def _load_sample(num: str) -> str:
    path = os.path.join(FIXTURES, "sample_input", f"SampleInput_{num}.html")
    with open(path, encoding="utf-8", errors="replace") as fh:
        return fh.read()


@pytest.mark.parametrize("num", sorted(PROBES.keys()))
def test_sample_probes(num):
    spec = PROBES[num]
    result = extract_document(_load_sample(num), spec["url"])
    assert result["content_extracted"], f"sample {num}: no content extracted"
    text = flatten_spans_text(result["spans"])
    missing = [p for p in spec["probes"] if p not in text]
    assert not missing, f"sample {num}: probes missing: {missing[:3]}"


@pytest.mark.parametrize("num", sorted(PROBES.keys()))
def test_sample_span_goldens(num):
    """Frozen span sequences: byte-equal across runs (regression oracle)."""
    golden_path = os.path.join(GOLDENS, f"SampleInput_{num}.spans.json")
    if not os.path.exists(golden_path):
        pytest.skip("golden not generated yet")
    spec = PROBES[num]
    result = extract_document(_load_sample(num), spec["url"])
    actual = {
        "title": result["title"],
        "content_extracted": result["content_extracted"],
        "next_page_url": result["next_page_url"],
        "spans": [
            [s["kind"], s["text"], s["media_ref"], s["offset"]] for s in result["spans"]
        ],
    }
    with open(golden_path, encoding="utf-8") as fh:
        golden = json.load(fh)
    assert actual["spans"] == golden["spans"]
    assert actual["title"] == golden["title"]
    assert actual["content_extracted"] == golden["content_extracted"]
    assert actual["next_page_url"] == golden["next_page_url"]


def test_determinism():
    """Same input twice -> identical span sequence."""
    html = _load_sample("09")
    a = extract_document(html)
    b = extract_document(html)
    assert a["spans"] == b["spans"]
    assert a["title"] == b["title"]
