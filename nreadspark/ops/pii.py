"""PII scrubbing for pretraining corpora -- the redaction pass public
pipelines (CCNet descendants, Dolma, BigScience ROOTS) run before text
ships to training: emails, US-SSN-shaped ids, IPv4 addresses and phone
numbers are replaced with stable sentinels and counted per document.

Everything is a CHAIN of ``regexp_replace`` / ``regexp_extract_all``
column expressions inside one whole-stage-codegen projection -- no
Python, no shuffle; at 100 TB this runs inside the scan stage of
whatever writes the scrubbed table.  The patterns are deliberately
restricted to syntax with identical semantics in Java regex (Spark) and
RE2 (DuckDB): ASCII ``\\d``/``\\b``, character classes, bounded
repetition -- no lookarounds, no backreferences -- so the driver oracle
replicates every replacement byte-for-byte.

Sequential semantics (the part both engines must agree on): categories
apply in the fixed order email -> ssn -> ipv4 -> phone, each scanning
the PREVIOUS category's output (sentinels contain no digits or ``@``, so
later passes cannot re-match inside an earlier redaction), and each
category's count is measured on the text it actually scanned.

Recall here is pattern-level, not NER-level, by design: names/addresses
need a model pass (a ``mapInArrow`` hook like the quality classifier);
the regex tier is what removes the machine-harvestable identifiers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# order matters and is part of the contract (see module docstring)
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("emails", r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssns", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("ipv4s", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    # phone: international-ish digit runs (>= 8 digits/group chars, digit
    # at both ends) -- after the ssn/ip passes, so it cannot eat those
    ("phones", r"\+?\d[\d()\- ]{6,}\d\b", "<PHONE>"),
]


def pii_scrub(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, clean_text, n_emails, n_ssns, n_ipv4s, n_phones): redact
    the four pattern categories in fixed order, count each on the text it
    scanned.  NULL text stays NULL with zero counts (matching the SQL
    twin's coalesce).

    Each stage's output is STAGED as a child-projection column (the
    round-6 multi-ref rule): stage k's text is read by stage k+1's count
    AND replace, so the plain expression chain re-ran the replace prefix
    ~10x per row instead of 4."""
    d = df.withColumn("__pii_s0", F.col(text_col))
    counts = []
    for k, (name, pattern, sentinel) in enumerate(PII_PATTERNS):
        cur = F.col(f"__pii_s{k}")
        counts.append(
            F.greatest(
                F.size(F.regexp_extract_all(cur, F.lit(pattern), 0)), F.lit(0)
            )
            .cast("bigint")
            .alias(f"n_{name}")
        )
        d = d.withColumn(
            f"__pii_s{k + 1}", F.regexp_replace(cur, pattern, sentinel)
        )
    return d.select(
        "doc_id",
        F.col(f"__pii_s{len(PII_PATTERNS)}").alias("clean_text"),
        *counts,
    )


def pii_scrub_sql(text_expr: str = "text") -> dict[str, str]:
    """The DuckDB twin of :func:`pii_scrub` as SQL expression strings --
    generated from the SAME :data:`PII_PATTERNS` table so the two engines
    cannot drift.  Returns ``{'clean_text': ..., 'n_emails': ..., ...}``."""
    cur = text_expr
    out: dict[str, str] = {}
    for name, pattern, sentinel in PII_PATTERNS:
        esc = pattern.replace("'", "''")
        out[f"n_{name}"] = (
            f"CAST(coalesce(len(regexp_extract_all({cur}, '{esc}')), 0) AS BIGINT)"
        )
        cur = f"regexp_replace({cur}, '{esc}', '{sentinel}', 'g')"
    out["clean_text"] = cur
    return out
