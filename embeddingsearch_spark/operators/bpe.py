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
