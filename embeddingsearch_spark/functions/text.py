"""Text-analysis Column builders: hashing/fingerprinting (reference
SearchdomainHelper.cs:455-458), tokenization, quality scoring, language-ID —
the text half of the LLM-data-pipeline surface (BASELINE.json north star).

All pure Catalyst expressions (codegen'd, no Python UDFs): at 100 TB these
run inside the parquet scan stage with zero extra shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def text_hash(text: Column) -> Column:
    """Canonical content hash: sha256 hex of the raw text (engine canonical
    form; the reference's base64(sha256) — SearchdomainHelper.cs:455-458 —
    is `F.base64(F.unhex(text_hash(c)))` when byte-parity matters)."""
    return F.sha2(text, 256)


def normalize(text: Column) -> Column:
    """Dedup normalization: lowercase, trim, collapse whitespace runs."""
    return F.regexp_replace(F.trim(F.lower(text)), r"\s+", " ")


def fingerprint(text: Column) -> Column:
    """Content fingerprint over normalized text — the exact-dedup key."""
    return F.sha2(normalize(text), 256)


def tokens(text: Column) -> Column:
    """Whitespace tokens of trimmed text; empty text → empty array."""
    t = F.trim(text)
    return F.when(F.length(t) == 0, F.array().cast("array<string>")).otherwise(
        F.split(t, r"\s+")
    )


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


# CJK Unified Ideographs (the BMP block both Java regex and RE2 match
# as a literal character range, so the SQL oracle mirrors it verbatim)
CJK_RANGE = "一-鿿"


def tokens_cjk(text: Column, n: int = 2) -> Column:
    """Tokenizer-aware mixed-script tokens: whitespace-split, then any
    token that is entirely CJK ideographs expands into its overlapping
    character ``n``-grams (single-char tokens stay whole); all other
    tokens pass through unchanged.

    Whitespace tokenization is meaningless for unsegmented CJK text —
    the standard IR fallback (Lucene's CJKAnalyzer — public) indexes
    overlapping character bigrams instead. This is the `tokens()`
    strategy flag for BM25/snippets over multilingual corpora: pass it
    as ``tokenizer=`` and zh queries match at sub-word granularity
    while other languages keep whitespace semantics. Pure scan-stage
    higher-order functions — no UDF, no shuffle."""
    is_cjk = f"^[{CJK_RANGE}]+$"

    def expand(tok: Column) -> Column:
        grams = F.transform(
            F.sequence(
                F.lit(1), F.greatest(F.lit(1), F.length(tok) - (n - 1))
            ),
            lambda i: F.substring(tok, i, n),
        )
        return F.when(tok.rlike(is_cjk), grams).otherwise(F.array(tok))

    return F.flatten(F.transform(tokens(text), expand))


# BPE-ish pre-tokenization: contractions, space-prefixed letter runs,
# digit runs, punctuation runs (the GPT-2 pattern family, without the
# lookahead so the same regex runs in Java regex and RE2 engines alike).
BPE_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?[\p{L}]+| ?[\p{N}]+| ?[^\s\p{L}\p{N}]+"


def bpe_tokens(text: Column) -> Column:
    """BPE-style pre-tokens (approximates LLM token segmentation far
    better than whitespace — the unit most token budgets count)."""
    return F.regexp_extract_all(text, F.lit(BPE_PATTERN), 0)


def bpe_token_count(text: Column) -> Column:
    return F.size(bpe_tokens(text))


def char_class_count(text: Column, char_class: str) -> Column:
    """Number of characters matching a regex character class."""
    return F.length(text) - F.length(F.regexp_replace(text, char_class, ""))


# Compact English stopword list for the stopword-ratio quality signal
# (a high ratio of function words indicates natural prose; near-zero
# flags boilerplate/code/tables).
STOPWORDS = [
    "the", "a", "an", "of", "and", "or", "to", "in", "is", "it", "that",
    "for", "on", "with", "as", "was", "are", "be", "by", "at", "this",
]


def stopword_ratio(text: Column) -> Column:
    toks = tokens(F.lower(text))
    sw = F.array(*[F.lit(w) for w in STOPWORDS])
    n_tok = F.size(toks)
    n_sw = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return F.when(n_tok == 0, F.lit(0.0)).otherwise(
        n_sw.cast("double") / n_tok.cast("double")
    )


def quality_metrics(text: Column) -> dict[str, Column]:
    """Length/punct/digit/space/stopword ratios + avg token length — the
    standard cheap quality signals for corpus filtering. Ratios in [0,1]."""
    n = F.length(text).cast("double")
    safe_n = F.when(n == 0, F.lit(1.0)).otherwise(n)
    n_tok = token_count(text).cast("double")
    punct = char_class_count(text, r"[^\p{L}\p{N}\s]").cast("double")
    digit = char_class_count(text, r"[0-9]").cast("double")
    space = char_class_count(text, r"\s").cast("double")
    return {
        "n_chars": n.cast("long"),
        "n_tokens": n_tok.cast("long"),
        "punct_ratio": punct / safe_n,
        "digit_ratio": digit / safe_n,
        "space_ratio": space / safe_n,
        "stopword_ratio": stopword_ratio(text),
        "avg_token_len": F.when(n_tok == 0, F.lit(0.0)).otherwise(
            (n - space) / n_tok
        ),
    }


# Marker stopwords per language for the n-gram-free heuristic language ID.
# Occurrence counts (with repeats) are compared; ties break to the
# lexicographically smallest code; no markers at all → 'und'.
LANG_MARKERS: dict[str, list[str]] = {
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "zu"],
    "en": ["the", "a", "of", "and", "to", "in", "is", "it"],
    "es": ["el", "los", "las", "y", "es", "que", "un", "una"],
    "fr": ["le", "la", "les", "et", "est", "que", "une", "dans"],
}


def lang_scores(text: Column) -> dict[str, Column]:
    toks = tokens(F.lower(text))
    out = {}
    for lang, markers in LANG_MARKERS.items():
        marker_arr = F.array(*[F.lit(m) for m in markers])
        out[lang] = F.size(
            F.filter(toks, lambda t: F.array_contains(marker_arr, t))
        )
    return out


def lang_id(text: Column) -> Column:
    """argmax over lang_scores; tie → smallest code; all-zero → 'und'."""
    scores = lang_scores(text)
    langs = sorted(scores)  # lexicographic order makes ties deterministic
    best_lang = F.lit("und")
    best_score = F.lit(0)
    for lang in reversed(langs):  # later (smaller) wins ties via >=
        cond = scores[lang] > 0
        better = scores[lang] >= best_score
        best_lang = F.when(cond & better, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(cond & better, scores[lang]).otherwise(best_score)
    return best_lang


def chunk_spans(text: Column, size: int = 64, overlap: int = 16) -> Column:
    """Overlapping token-window chunks as an array of structs
    (chunk_id, chunk_text): windows of ``size`` tokens starting every
    ``size - overlap`` tokens. Pure scan-stage sequence/slice — chunking
    100 TB of documents adds no shuffle; follow with `explode` for one
    row per chunk (the standard pre-embedding unit for long docs).

    Prefer pre-projecting ``tokens(text)`` into a column and calling
    ``chunk_spans_of`` on the hot path: inlining the tokenization makes
    the per-chunk lambda re-evaluate split(trim(text)) once PER CHUNK
    (the word_shingles_of hazard)."""
    return chunk_spans_of(tokens(text), size=size, overlap=overlap)


def chunk_spans_of(
    toks: Column, size: int = 64, overlap: int = 16
) -> Column:
    """``chunk_spans`` over an ALREADY-MATERIALIZED token array column —
    the per-chunk slice then reads an attribute instead of re-running
    tokenization per chunk."""
    if overlap >= size:
        raise ValueError("overlap must be < size")
    step = size - overlap
    n = F.size(toks)
    n_chunks = (
        F.when(n == 0, F.lit(0))
        .when(n <= overlap, F.lit(1))
        .otherwise(F.floor((n - F.lit(overlap) - 1) / step) + 1)
    )
    starts = F.sequence(
        F.lit(0), F.greatest(n_chunks - 1, F.lit(0)).cast("int"), F.lit(1)
    )
    return F.when(n == 0, F.array().cast("array<struct<chunk_id:int,chunk_text:string>>")).otherwise(
        F.transform(
            starts,
            lambda i: F.struct(
                i.cast("int").alias("chunk_id"),
                F.array_join(
                    F.slice(toks, i * step + 1, size), " "
                ).alias("chunk_text"),
            ),
        )
    )


def word_shingles_of(toks: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles from an ALREADY-MATERIALIZED token
    array column. Callers should pre-project ``tokens(text)`` into a
    column and pass it here: inlining the tokenization makes the
    transform lambda re-evaluate split(trim(text)) once PER SHINGLE
    INDEX (O(L·split) per doc) — pre-projection measured 2.4x faster on
    the gram-explode hot path at 100k docs."""
    idx = F.sequence(F.lit(1), F.greatest(F.lit(1), F.size(toks) - (n - 1)))
    return F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, n)))
    )


def word_shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles (the near-dup unit). Texts shorter than
    n tokens yield their single full-text shingle. Prefer pre-projecting
    tokens() and calling word_shingles_of on the hot path (see there)."""
    return word_shingles_of(tokens(text), n)


def clean_web_text(text: Column) -> Column:
    """Web-text normalization (the CCNet/C4-family cleanup pass that runs
    BEFORE hashing/dedup so cosmetic encoding noise doesn't defeat exact
    fingerprints — public recipe): CRLF → LF; unicode space variants
    (NBSP, en/em/thin spaces, ideographic space) → ASCII space; zero-width
    characters and BOM removed; control characters stripped (newline and
    tab kept, tab → space); runs of spaces collapsed; 3+ blank lines
    collapsed to one blank line; per-line and outer trim.

    Pure Catalyst regexp chain — scan-stage, zero shuffle, oracle-exact
    in any RE2/Java-regex engine."""
    t = F.regexp_replace(text, r"\r\n?", "\n")
    # zero-width + BOM: remove entirely
    t = F.regexp_replace(t, r"[\x{200B}\x{200C}\x{200D}\x{FEFF}]", "")
    # unicode space variants + tab -> plain space
    t = F.regexp_replace(
        t,
        r"[\t\x{00A0}\x{1680}\x{2000}-\x{200A}\x{202F}\x{205F}\x{3000}]",
        " ",
    )
    # other control chars (keep \n)
    t = F.regexp_replace(t, r"[\x{0000}-\x{0009}\x{000B}-\x{001F}\x{007F}]", "")
    # collapse space runs; strip spaces around newlines
    t = F.regexp_replace(t, r" {2,}", " ")
    t = F.regexp_replace(t, r" ?\n ?", "\n")
    # collapse 3+ newlines to exactly two (one blank line)
    t = F.regexp_replace(t, r"\n{3,}", "\n\n")
    return F.trim(t)


def html_to_text(html: Column) -> Column:
    """Regex-based HTML → text extraction (the raw-crawl step BEFORE the
    WET-style text the rest of the pipeline consumes; public recipe —
    the same family as W3C's text/html stripping everyone implements):
    <script>/<style>/<!--comment--> blocks dropped whole; block-level
    closers (</p>, </div>, <br>, </li>, </h1..6>, </tr>) become
    newlines; remaining tags stripped; the core entities decoded
    (&amp; &lt; &gt; &quot; &#39; &nbsp;); whitespace normalized via
    `clean_web_text`. Pure Catalyst regexp chain — scan-stage; no HTML
    parser dependency, which is the point at 100 TB (a real DOM parse
    is a Pandas-UDF seam a user can swap in where fidelity matters).
    """
    # two separate patterns, not one with a backreference: the DuckDB
    # oracle runs RE2, which has no backreferences
    t = F.regexp_replace(
        html, r"(?is)<script\b[^>]*>.*?</script\s*>", " "
    )
    t = F.regexp_replace(t, r"(?is)<style\b[^>]*>.*?</style\s*>", " ")
    t = F.regexp_replace(t, r"(?s)<!--.*?-->", " ")
    t = F.regexp_replace(
        t, r"(?i)</?(p|div|li|tr|h[1-6])\b[^>]*>|<br\s*/?>", "\n"
    )
    t = F.regexp_replace(t, r"(?s)<[^>]+>", " ")
    for ent, rep in (
        ("&nbsp;", " "),
        ("&lt;", "<"),
        ("&gt;", ">"),
        ("&quot;", '"'),
        ("&#39;", "'"),
        ("&amp;", "&"),  # last, so &amp;lt; decodes to &lt; not <
    ):
        t = F.replace(t, F.lit(ent), F.lit(rep))
    return clean_web_text(t)


def _mojibake_pairs() -> list[tuple[str, str]]:
    """(damaged, repaired) pairs for the classic UTF-8-read-as-cp1252
    double-encoding damage (the ftfy core case, public): each target
    char's UTF-8 bytes decoded as cp1252 (latin-1 for the few bytes
    cp1252 leaves undefined) IS the damaged sequence — derived, not
    hand-typed, so the table can't drift from the encodings."""
    targets = [
        "’", "‘", "“", "”",  # curly quotes
        "–", "—", "…",            # dashes, ellipsis
        "é", "è", "ê", "ü", "ä", "ö",
        "ñ", "ç", "ß", "à",  # common accents
        " ",                                  # NBSP ('Â ')
    ]
    # Decode PER BYTE, not per sequence: a real cp1252 reader maps each
    # byte independently (0x80 -> '€', 0x9D undefined -> passthrough), so
    # ” (E2 80 9D) damages to 'â€\x9d', not latin-1's 'â\x80\x9d'. The
    # five cp1252-undefined bytes (0x81 8D 8F 90 9D) pass through as
    # their latin-1 codepoints, matching what lenient readers emit.
    undefined = {0x81, 0x8D, 0x8F, 0x90, 0x9D}
    pairs = []
    for ch in targets:
        moji = "".join(
            chr(x) if x in undefined else bytes([x]).decode("cp1252")
            for x in ch.encode("utf-8")
        )
        pairs.append((moji, ch))
    return pairs


MOJIBAKE_PAIRS = _mojibake_pairs()


def fix_mojibake(text: Column) -> Column:
    """Repair the most common UTF-8-as-cp1252 mojibake sequences
    (â€™ → ’, Ã© → é, …) with a chained literal replace — scan-stage,
    zero shuffle, and table-driven so the DuckDB oracle renders the
    identical pairs from MOJIBAKE_PAIRS. Longer sequences first so a
    3-byte repair can't be half-eaten by a 2-byte one. Not a general
    decoder (ftfy handles nested damage); these cover the bulk of real
    crawl damage and compose with `clean_web_text`."""
    t = text
    for moji, fixed in sorted(
        MOJIBAKE_PAIRS, key=lambda p: -len(p[0])
    ):
        t = F.replace(t, F.lit(moji), F.lit(fixed))
    return t
