"""Frozen span goldens for the synthetic corpus families.

The SampleInput goldens lock parity with the reference's pages; these lock
the kernel's behavior on the corpus families the fixtures don't cover
(interleaved media, mega-docs, link farms, sparse fallback docs).  Any
semantic drift in a later round fails here first.

The golden stores (kind, sha1(text), media_ref, offset) per span -- text is
hashed to keep the file small; a hash mismatch still pinpoints the doc.
"""

from __future__ import annotations

import hashlib
import json
import os

GOLDEN_PATH = os.path.join(
    os.path.dirname(__file__), "fixtures", "goldens", "corpus_docs.spans.json"
)
N_DOCS = 40  # covers every family at the default weights


def _extract_all():
    from nreadspark.corpus import generate_rows
    from nreadspark.kernel import Options, transcode
    from nreadspark.spans import extract_spans, spans_to_html

    opts = Options()
    out = {}
    for doc_id, spans in generate_rows(0, N_DOCS):
        html = spans_to_html(sorted(spans, key=lambda s: s["offset"]))
        result = transcode(html, None, opts)
        rows = []
        for s in extract_spans(result.article_content):
            rows.append(
                [
                    s["kind"],
                    hashlib.sha1((s["text"] or "").encode()).hexdigest()[:16],
                    s["media_ref"],
                    s["offset"],
                ]
            )
        out[doc_id] = {
            "spans": rows,
            "title": result.title,
            "content_extracted": result.content_extracted,
        }
    return out


def test_corpus_spans_match_goldens():
    actual = _extract_all()
    if not os.path.exists(GOLDEN_PATH):
        with open(GOLDEN_PATH, "w") as f:
            json.dump(actual, f, indent=1, sort_keys=True)
        raise AssertionError(
            "corpus golden did not exist; frozen now -- rerun to validate"
        )
    golden = json.load(open(GOLDEN_PATH))
    assert set(actual) == set(golden)
    for doc_id in sorted(golden):
        assert actual[doc_id] == golden[doc_id], f"span drift in {doc_id}"
