"""Phrase detection via bigram PMI (the word2phrase idea): adjacent
token pairs that co-occur far more than their unigram frequencies
predict are phrases ("new york", "machine learning") worth merging
before tokenizer training.

Scale shape: two scan-side explodes (unigrams, adjacent bigrams) into
two map-side-combinable counts; the bigram->unigram joins hit the
unigram count table, which is vocabulary-sized and broadcastable after
a `min_count` cut. Corpus text never shuffles; everything is Catalyst
expressions (element_at over a 1-based sequence — no UDFs), so the
DuckDB oracle reproduces scores exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from embeddingsearch_spark.constants import ROUND_DIGITS
from embeddingsearch_spark.functions.text import tokens


def _toks(df: DataFrame, text_col: str) -> DataFrame:
    return df.select(
        tokens(F.lower(F.col(text_col))).alias("_t")
    )


def phrase_scores(
    docs: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
) -> DataFrame:
    """(w1, w2, n_pair, n_w1, n_w2, pmi): adjacent-bigram pointwise
    mutual information, ln((n_pair/B) / ((n_w1/T) * (n_w2/T))) with
    T = total tokens, B = total bigrams, rounded to ROUND_DIGITS.
    Bigrams below ``min_count`` are cut before the joins (the
    vocabulary-bounding knob)."""
    t = _toks(docs, text_col)
    uni = (
        t.select(F.explode("_t").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n_w"))
    )
    bi = (
        t.filter(F.size("_t") >= 2)
        .select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("_t") - 1),
                    lambda i: F.struct(
                        F.element_at("_t", i).alias("w1"),
                        F.element_at("_t", i + 1).alias("w2"),
                    ),
                )
            ).alias("p")
        )
        .select("p.w1", "p.w2")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("n_pair"))
        .filter(F.col("n_pair") >= min_count)
    )
    totals = t.select(
        F.sum(F.size("_t")).alias("T"),
        F.sum(F.greatest(F.size("_t") - 1, F.lit(0))).alias("B"),
    )
    scored = (
        bi.crossJoin(F.broadcast(totals))  # 1-row totals literal
        .join(uni.withColumnRenamed("w", "w1").withColumnRenamed("n_w", "n_w1"), "w1")
        .join(uni.withColumnRenamed("w", "w2").withColumnRenamed("n_w", "n_w2"), "w2")
    )
    pmi = F.log(
        (F.col("n_pair") / F.col("B"))
        / ((F.col("n_w1") / F.col("T")) * (F.col("n_w2") / F.col("T")))
    )
    return scored.select(
        "w1",
        "w2",
        "n_pair",
        "n_w1",
        "n_w2",
        # + 0.0 canonicalizes IEEE -0.0 (a bigram at chance minus
        # epsilon rounds to -0.0) so the value hash matches engines
        # that produce +0.0 — the gram_upper convention.
        (F.round(pmi, ROUND_DIGITS) + F.lit(0.0)).alias("pmi"),
    )
