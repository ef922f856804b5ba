"""Unigram language-model scoring (CCNet-style quality signal): build a
unigram LM from the corpus itself (or any reference corpus), then score
every document by its per-token negative log-likelihood / perplexity.
Low-perplexity docs look like the corpus core; high-perplexity docs are
noise, boilerplate, or the wrong language — the standard cheap filter
before expensive model-based scoring.

Plan shape (what survives 100 TB):
  - vocabulary: one explode + hash-partitioned count per token (map-side
    partial aggregation absorbs the heavy hitters), truncated to the
    top-K tokens with a deterministic tie-break. K is a few tens of
    thousands — the vocab BROADCASTS to the scoring join; everything
    below the cut scores as OOV through add-alpha smoothing.
  - scoring: explode doc tokens, broadcast-join the vocab, one groupBy
    per doc for the average. Two corpus-wide shuffles total (vocab
    count, per-doc aggregate); text itself never shuffles.

Probability model (engine-reproducible, oracle-exact):
  p(tok) = (c(tok) + a) / (N + a * (K + 1))
with c = corpus count if tok is in the top-K vocab else 0, N = total
token count over the WHOLE corpus (not just the vocab), a = smoothing.
All tokens are lowercased.

The reference engine has no LM surface (SURVEY.md §2); this extends the
training-data-pipeline layer (BASELINE.json north star).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from embeddingsearch_spark.functions.text import tokens


def _doc_tokens(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    return df.select(
        F.col(id_col),
        F.explode(tokens(F.lower(F.col(text_col)))).alias("tok"),
    )


def unigram_vocab(
    df: DataFrame, id_col: str, text_col: str, vocab_size: int = 65536
) -> DataFrame:
    """Top-``vocab_size`` tokens by corpus count: ``(tok, c)``. Ties break
    on the token string so the cut is deterministic across runs, engines,
    and partitionings."""
    counts = (
        _doc_tokens(df, id_col, text_col)
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return counts.orderBy(F.col("c").desc(), F.col("tok")).limit(vocab_size)


def unigram_scores(
    df: DataFrame,
    id_col: str,
    text_col: str,
    vocab_size: int = 65536,
    smoothing: float = 1.0,
    reference: DataFrame | None = None,
) -> DataFrame:
    """Per-doc unigram LM stats: ``(id, n_tokens, n_oov, avg_nll,
    perplexity)`` where avg_nll is the mean negative natural-log
    probability and perplexity = exp(avg_nll). Empty docs score NULL.

    ``reference`` scores ``df`` under a different corpus's LM (e.g. score
    a crawl against a trusted corpus); default is self-scoring."""
    ref = reference if reference is not None else df
    vocab = unigram_vocab(ref, id_col, text_col, vocab_size)
    # two tiny scalars (bounded: one row) — N and the realized vocab size
    totals = (
        _doc_tokens(ref, id_col, text_col)
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()[0]
    )
    n_total = totals["n"]
    k = vocab.count()
    denom = float(n_total) + smoothing * (k + 1)
    toks = _doc_tokens(df, id_col, text_col)
    scored = toks.join(F.broadcast(vocab), "tok", "left_outer").select(
        F.col(id_col),
        F.coalesce("c", F.lit(0)).alias("c"),
    )
    logp = F.log((F.col("c") + F.lit(smoothing)) / F.lit(denom))
    return (
        scored.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.when(F.col("c") == 0, 1).otherwise(0)).alias("n_oov"),
            F.avg(-logp).alias("avg_nll"),
        )
        .withColumn("perplexity", F.exp(F.col("avg_nll")))
    )
