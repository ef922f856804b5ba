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


def perplexity_buckets(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_buckets: int = 3,
    vocab_size: int = 65536,
    smoothing: float = 1.0,
    reference: DataFrame | None = None,
) -> DataFrame:
    """CCNet-style perplexity partitioning (Wenzek et al. 2020,
    arXiv:1911.00359 — public): score every doc under the LM, sort by
    perplexity, and cut the corpus into ``n_buckets`` equal-count
    segments — bucket 1 ("head") is the lowest-perplexity (cleanest)
    slice, the classic high-quality pretraining subset. Returns
    ``(id, perplexity, bucket, segment)``; docs the LM cannot score
    (empty after tokenization) are dropped, as CCNet drops them.

    Exact ntile semantics WITHOUT a single-partition global sort: the
    global rank comes from `assign_global_ids` (range-partition + two
    passes — SURVEY §2.5's global_ids machinery), and the SQL-standard
    ntile bucket is pure rank arithmetic from (rank, total), so the cut
    is deterministic (ties broken by id) and involves zero float
    threshold comparisons — any engine's ntile reproduces it.
    """
    from embeddingsearch_spark.constants import ROUND_DIGITS
    from embeddingsearch_spark.operators.ids import assign_global_ids

    scored = (
        unigram_scores(
            df, id_col, text_col, vocab_size, smoothing, reference
        )
        .filter(F.col("avg_nll").isNotNull())
        .select(
            F.col(id_col),
            F.round("perplexity", ROUND_DIGITS).alias("perplexity"),
        )
    )
    ranked, total = assign_global_ids(
        scored, ["perplexity", id_col], out_col="_rk", return_total=True
    )
    size, rem = divmod(total, n_buckets)
    r = F.col("_rk")
    if size == 0:
        bucket = (r + 1).cast("int")
    else:
        # SQL ntile: first `rem` buckets hold size+1 rows, the rest size
        bucket = (
            F.when(r < rem * (size + 1), F.floor(r / (size + 1)))
            .otherwise(rem + F.floor((r - rem * (size + 1)) / size))
            + 1
        ).cast("int")
    names = {1: "head", 2: "middle", 3: "tail"} if n_buckets == 3 else {}
    segment = F.col("bucket").cast("string")
    for b, name in names.items():
        segment = F.when(F.col("bucket") == b, F.lit(name)).otherwise(
            segment
        )
    return ranked.select(
        id_col, "perplexity", bucket.alias("bucket")
    ).withColumn("segment", segment)
