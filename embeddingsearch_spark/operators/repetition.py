"""Repetition-based quality filters (the Gopher/MassiveText family):
duplicate-line fraction, most-common-2-gram token fraction, duplicate
5-gram token fraction — the standard removers of boilerplate, SEO spam,
and degenerate repetition in pretraining corpora. Beyond-reference op
(training-data-pipeline surface).

Scale shape: every metric is a pure function of ONE document, so the
operator is zero-shuffle — an Arrow-batched mapInPandas computing
per-doc Counters. The alternative (explode n-grams → groupBy (doc,
gram)) shuffles O(total tokens) rows twice; at 100 TB that's the
difference between a scan and a multi-TB exchange. Python-vs-JVM is the
right trade here because per-doc mode/dup counting has no vectorized
Catalyst form (aggregate exprs can't group within a row without O(L²)
HOF scans).

Tokenization parity: tokens = split(trim(text), '\\s+'), empty → [] —
byte-compatible with functions.text.tokens and the DuckDB oracle's
TOKS_SQL, so fractions reproduce across engines bit-for-bit (ratios of
exact ints in IEEE double).
"""

from __future__ import annotations

import re
from collections import Counter

from pyspark.sql import DataFrame

_WS = re.compile(r"\s+")

# Gopher-ish keep thresholds
MAX_DUP_LINE_FRAC = 0.3
MAX_TOP2_FRAC = 0.2
MAX_DUP5_FRAC = 0.3


def _doc_metrics(text: str) -> tuple[int, float, float, float]:
    t = text or ""
    lines = t.split("\n")
    dup_line_frac = (
        1.0 - len(set(lines)) / len(lines) if lines else 0.0
    )
    stripped = t.strip()
    toks = _WS.split(stripped) if stripped else []
    n = len(toks)
    top2_frac = 0.0
    if n >= 2:
        c2 = Counter(zip(toks, toks[1:]))
        top2_frac = max(c2.values()) * 2 / n
    dup5_frac = 0.0
    if n >= 5:
        c5 = Counter(zip(toks, toks[1:], toks[2:], toks[3:], toks[4:]))
        dup = sum(c for c in c5.values() if c > 1)
        dup5_frac = dup * 5 / n
    return n, dup_line_frac, top2_frac, dup5_frac


def repetition_profile(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-doc repetition metrics + keep flag. Fractions are emitted RAW
    (ratios of exact ints — identical in any IEEE engine; presentation
    rounding belongs to the caller so engine-specific round-half rules
    never leak in here)."""
    schema = (
        f"{id_col} long, n_tokens long, dup_line_frac double, "
        "top2_frac double, dup5_frac double, keep boolean"
    )

    def run(batches):
        for pdf in batches:
            out = {
                id_col: pdf[id_col],
                "n_tokens": [],
                "dup_line_frac": [],
                "top2_frac": [],
                "dup5_frac": [],
                "keep": [],
            }
            for text in pdf[text_col]:
                n, dlf, t2, d5 = _doc_metrics(text)
                out["n_tokens"].append(n)
                out["dup_line_frac"].append(dlf)
                out["top2_frac"].append(t2)
                out["dup5_frac"].append(d5)
                out["keep"].append(
                    dlf <= MAX_DUP_LINE_FRAC
                    and t2 <= MAX_TOP2_FRAC
                    and d5 <= MAX_DUP5_FRAC
                )
            import pandas as pd

            yield pd.DataFrame(out)

    return df.select(id_col, text_col).mapInPandas(run, schema=schema)


def remove_repetitive(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Corpus minus repetitive docs — the filter fuses with the profile
    scan (no join: metrics are computed in the same pass)."""
    prof = repetition_profile(df, id_col, text_col).filter("keep")
    return df.join(prof.select(id_col), id_col, "left_semi")
