#!/usr/bin/env python3
"""Refresh the vendored Public Suffix List snapshot.

Downloads the full upstream list (MPL 2.0) and writes it verbatim over
``nreadspark/resources/public_suffix_list.dat`` with a dated provenance
header.  Run from any machine with network access; the sandbox this repo
is developed in has none, which is why the vendored file is a curated
subset -- the parser (``nreadspark.ops.urls.load_psl``) handles the full
file unchanged.

Usage: python scripts/update_psl.py
"""

from __future__ import annotations

import datetime
import sys
import urllib.request
from pathlib import Path

URL = "https://publicsuffix.org/list/public_suffix_list.dat"
DEST = (
    Path(__file__).resolve().parent.parent
    / "nreadspark"
    / "resources"
    / "public_suffix_list.dat"
)


def main() -> int:
    print(f"fetching {URL} ...")
    with urllib.request.urlopen(URL, timeout=60) as resp:
        body = resp.read().decode("utf-8")
    if "===BEGIN ICANN DOMAINS===" not in body:
        print("unexpected payload (no ICANN section marker); aborting")
        return 1
    stamp = datetime.date.today().isoformat()
    header = (
        "// Public Suffix List snapshot (FULL) — vendored for nreadspark\n"
        f"// PROVENANCE: fetched {stamp} from {URL} (MPL 2.0), verbatim below.\n"
    )
    DEST.write_text(header + body, encoding="utf-8")
    n_rules = sum(
        1
        for ln in body.splitlines()
        if ln.strip() and not ln.strip().startswith("//")
    )
    print(f"wrote {DEST} ({n_rules} rules)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
