"""BPE tokenizer-training statistics (Sennrich et al. 2016,
arXiv:1508.07909 — public): the pair-frequency counting at the core of
byte-pair-encoding training, as declarative DataFrame ops.

The 100-TB trick is the one the original algorithm uses: BPE statistics
depend only on the WORD HISTOGRAM, not the corpus. So the corpus is
reduced to (word, count) first — one map-side-combinable groupBy whose
output is vocabulary-sized — and the symbolize/pair-explode stages run
over that small table. A trillion-token corpus with a 10M-type
vocabulary explodes ~100M pair rows, not trillions.

`bpe_pair_counts` = one training round's statistics (symbol = character,
end-of-word marker appended). Full iterative training applies the best
merge and recounts — a driver loop over vocabulary-sized data (the
corpus is never touched again); `bpe_top_merges` ranks merge candidates
deterministically for that loop.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from embeddingsearch_spark.functions.text import tokens

END_MARKER = "</w>"


def word_histogram(
    df: DataFrame, text_col: str = "text", lowercase: bool = True
) -> DataFrame:
    """(word, n) counts — the only corpus-sized pass."""
    t = F.col(text_col)
    if lowercase:
        t = F.lower(t)
    return (
        df.select(F.explode(tokens(t)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def bpe_pair_counts(
    df: DataFrame,
    text_col: str = "text",
    lowercase: bool = True,
    end_marker: str = END_MARKER,
) -> DataFrame:
    """Adjacent-symbol pair counts weighted by word frequency:
    (a, b, n_pairs). Symbols are characters plus ``end_marker`` closing
    each word (so 'low' contributes (l,o), (o,w), (w,</w>))."""
    # symbols materialized as a column: element_at(<expr>, i) inside the
    # pair lambda would re-split the word once per pair
    wc = word_histogram(df, text_col, lowercase).withColumn(
        "_syms",
        F.concat(
            F.filter(F.split(F.col("word"), ""), lambda c: c != ""),
            F.array(F.lit(end_marker)),
        ),
    )
    syms = F.col("_syms")
    pair = F.explode(
        F.transform(
            F.sequence(F.lit(0), F.size(syms) - 2),
            lambda i: F.struct(
                F.element_at(syms, i + 1).alias("a"),
                F.element_at(syms, i + 2).alias("b"),
            ),
        )
    )
    return (
        wc.select("n", pair.alias("p"))
        .select("n", F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .groupBy("a", "b")
        .agg(F.sum("n").alias("n_pairs"))
    )


def bpe_top_merges(
    pair_counts: DataFrame, n_merges: int = 40
) -> DataFrame:
    """Deterministically ranked merge candidates: count DESC, then
    (a, b) ASC so independent engines pick identical merges.

    The global window is fine HERE and only here: pair_counts is
    symbol-alphabet² bounded (vocabulary-scale, not corpus-scale), so
    the single-partition sort ranks at most ~10⁵-10⁶ rows regardless of
    corpus size."""
    w = Window.orderBy(
        F.col("n_pairs").desc(), F.col("a").asc(), F.col("b").asc()
    )
    return (
        pair_counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= n_merges)
        .select("a", "b", "n_pairs", "rank")
    )


def bpe_apply_words(
    words: DataFrame,
    merges: DataFrame,
    word_col: str = "word",
    end_marker: str = END_MARKER,
    max_steps: int = 64,
) -> DataFrame:
    """Apply a ranked merge table to each distinct word:
    ``(word, pieces, n_pieces)`` with pieces space-joined.

    The merge table is a model artifact (thousands of rows at most) and
    is collected driver-side; words encode independently in an
    Arrow-batched mapInPandas. Apply semantics — engine-reproducible by
    construction: symbols start as characters + end_marker; each step
    finds the lowest-rank merge whose delimited pair occurs in the
    symbol string and rewrites ALL leftmost-non-overlapping occurrences
    (Python str.replace == DuckDB replace()); repeat until no ranked
    pair remains (capped at ``max_steps``, far above any real word).
    A partially-merged consecutive run (the ' a b a b ' case) is
    finished on the next step because the pair is still the lowest rank
    present; with single-level merge tables a derived symbol never
    outranks its parents, so the fixpoint equals the all-at-once merge.
    """
    import pandas as pd

    ranked = sorted(
        ((r["rank"], r["a"], r["b"]) for r in merges.collect()),
    )
    out_schema = f"{word_col} string, pieces string, n_pieces int"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for word in pdf[word_col]:
                w = str(word)
                s = " " + " ".join(list(w) + [end_marker]) + " "
                for _ in range(max_steps):
                    hit = next(
                        (
                            (a, b)
                            for _, a, b in ranked
                            if f" {a} {b} " in s
                        ),
                        None,
                    )
                    if hit is None:
                        break
                    a, b = hit
                    s = s.replace(f" {a} {b} ", f" {a}{b} ")
                pieces = s.strip().split(" ")
                recs.append((w, " ".join(pieces), len(pieces)))
            yield pd.DataFrame(
                recs, columns=[word_col, "pieces", "n_pieces"]
            )

    return words.select(word_col).distinct().mapInPandas(
        run, schema=out_schema
    )


def bpe_encode_docs(
    df: DataFrame,
    merges: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lowercase: bool = True,
) -> DataFrame:
    """Per-doc BPE piece counts under a trained merge table:
    ``(id, n_words, n_bpe_pieces)``.

    Scale shape: the corpus reduces to per-doc WORD COUNTS (one
    map-side-combinable groupBy); only the distinct-word vocabulary runs
    the merge loop (vocab-sized Python, not corpus-sized), and the
    encoded vocab broadcasts back onto the per-doc counts — the token
    stream itself is never re-encoded row by row.
    """
    txt = F.lower(F.col(text_col)) if lowercase else F.col(text_col)
    dwc = (
        df.select(F.col(id_col), F.explode(tokens(txt)).alias("word"))
        .groupBy(id_col, "word")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    enc = bpe_apply_words(dwc.select("word"), merges)
    return (
        dwc.join(F.broadcast(enc), "word")
        .groupBy(id_col)
        .agg(
            F.sum("c").cast("bigint").alias("n_words"),
            F.sum(F.col("c") * F.col("n_pieces"))
            .cast("bigint")
            .alias("n_bpe_pieces"),
        )
    )
