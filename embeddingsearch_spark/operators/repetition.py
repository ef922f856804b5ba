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


# Gopher document-level rule thresholds (Rae et al. 2021, arXiv:2112.11446
# Table A1 — public). Word-count bounds are parameters (the defaults are
# the paper's); ratio thresholds are the paper's constants.
GOPHER_MAX_SYMBOL_RATIO = 0.1
GOPHER_MAX_BULLET_FRAC = 0.9
GOPHER_MAX_ELLIPSIS_FRAC = 0.3
GOPHER_MIN_ALPHA_FRAC = 0.8
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_rules(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    min_stop_hits: int = 2,
) -> DataFrame:
    """The Gopher/MassiveText document-level quality rules (Rae et al.
    2021 Table A1) as ONE scan-stage projection — zero shuffles, zero
    Python; composes with `repetition_profile` (the intra-doc repetition
    half of the same table) and the engine's other gates via
    `corpus_policy`-style semi-joins.

    Rules: word-count bounds; mean word length in [3, 10]; symbol-to-
    word ratio ('#' chars + non-overlapping '...' runs) <= 0.1; <= 90%
    of lines bullet-initial; <= 30% of lines ellipsis-final; >= 80% of
    words contain an alphabetic character; >= 2 distinct required
    stopwords present. Output: per-doc metrics (ratios rounded for
    display only — rule decisions use the raw values) + per-rule flags
    + overall ``keep``.
    """
    from pyspark.sql import functions as F

    from embeddingsearch_spark.constants import ROUND_DIGITS
    from embeddingsearch_spark.functions.text import tokens

    text = F.col(text_col)
    toks = tokens(text)
    n_words = F.size(toks).cast("double")
    safe_w = F.when(n_words == 0, F.lit(1.0)).otherwise(n_words)
    n_chars = F.length(text).cast("double")
    n_space = (
        n_chars - F.length(F.regexp_replace(text, r"\s", ""))
    )
    mean_wl = F.when(n_words == 0, F.lit(0.0)).otherwise(
        (n_chars - n_space) / n_words
    )
    n_hash = n_chars - F.length(F.regexp_replace(text, r"#", ""))
    n_ellipsis = (
        n_chars - F.length(F.regexp_replace(text, r"\.\.\.", ""))
    ) / 3.0
    symbol_ratio = (n_hash + n_ellipsis) / safe_w
    lines = F.split(text, "\n")
    n_lines = F.size(lines).cast("double")
    bullet_frac = (
        F.size(
            F.filter(
                lines,
                lambda l: F.ltrim(l).rlike(r"^[-*•]"),
            )
        ).cast("double")
        / n_lines
    )
    ellipsis_frac = (
        F.size(
            F.filter(lines, lambda l: F.rtrim(l).rlike(r"\.\.\.$"))
        ).cast("double")
        / n_lines
    )
    alpha_frac = (
        F.size(
            F.filter(toks, lambda t: t.rlike(r"\p{L}"))
        ).cast("double")
        / safe_w
    )
    stop_hits = F.size(
        F.array_intersect(
            F.array_distinct(F.transform(toks, F.lower)),
            F.array(*[F.lit(w) for w in GOPHER_STOPWORDS]),
        )
    )
    rules = {
        "r_words": (n_words >= min_words) & (n_words <= max_words),
        "r_word_len": (mean_wl >= min_mean_word_len)
        & (mean_wl <= max_mean_word_len),
        "r_symbol": symbol_ratio <= GOPHER_MAX_SYMBOL_RATIO,
        "r_bullet": bullet_frac <= GOPHER_MAX_BULLET_FRAC,
        "r_ellipsis": ellipsis_frac <= GOPHER_MAX_ELLIPSIS_FRAC,
        "r_alpha": alpha_frac >= GOPHER_MIN_ALPHA_FRAC,
        "r_stop": stop_hits >= min_stop_hits,
    }
    keep = F.lit(True)
    for expr in rules.values():
        keep = keep & expr
    return df.select(
        F.col(id_col),
        n_words.cast("long").alias("n_words"),
        F.round(mean_wl, ROUND_DIGITS).alias("mean_word_len"),
        F.round(symbol_ratio, ROUND_DIGITS).alias("symbol_ratio"),
        F.round(bullet_frac, ROUND_DIGITS).alias("bullet_frac"),
        F.round(ellipsis_frac, ROUND_DIGITS).alias("ellipsis_frac"),
        F.round(alpha_frac, ROUND_DIGITS).alias("alpha_frac"),
        stop_hits.cast("int").alias("n_stop_hits"),
        *[expr.alias(name) for name, expr in rules.items()],
        keep.alias("keep"),
    )
