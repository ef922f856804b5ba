"""PII redaction for training corpora: emails, NANP phone numbers, IPv4
addresses, SSN-shaped ids — pure Catalyst ``regexp_replace`` chains that
run in the scan stage under whole-stage codegen. No Python in the hot
path.

Pattern notes: every regex here avoids lookaround so the same pattern
behaves identically under Java's backtracking engine (Spark) and RE2
(DuckDB oracle) — both support ``\\b``, ``\\d``, and non-capturing
groups; neither semantics diverge on these unambiguous patterns.

The reference engine has no redaction surface; this is part of the
training-data-pipeline layer (BASELINE.json north star).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# order matters: SSN before phone (both are dashed digit runs), email
# before everything (it embeds digits/dots).
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
]


def redact_pii(text: Column, kinds: list[str] | None = None) -> Column:
    """Replace every PII match with its typed placeholder. One
    regexp_replace per kind, chained in PII_PATTERNS order so earlier
    redactions can't be re-matched by later patterns."""
    out = text
    for kind, pattern, token in PII_PATTERNS:
        if kinds is not None and kind not in kinds:
            continue
        out = F.regexp_replace(out, pattern, token)
    return out


def pii_counts(text: Column) -> dict[str, Column]:
    """Per-kind match counts on the ORIGINAL text (independent counts —
    compute before redaction)."""
    return {
        kind: F.regexp_count(text, F.lit(pattern)).alias(f"n_{kind}")
        for kind, pattern, _ in PII_PATTERNS
    }
