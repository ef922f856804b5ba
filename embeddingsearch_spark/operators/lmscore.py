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


def corpus_token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus-level lowered-token counts ``(tok, c)`` — THE engine
    tokenization for unigram statistics, shared by LM scoring and
    drift monitoring so the two can't silently diverge."""
    return (
        df.select(
            F.explode(tokens(F.lower(F.col(text_col)))).alias("tok")
        )
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def corpus_token_counts_federated(
    df: DataFrame,
    text_col: str = "text",
    partition_col: str = "source",
) -> DataFrame:
    """`corpus_token_counts` PER COLLECTION: ``(partition_col, tok,
    c)`` — one explode + one hash-partitioned count keyed by
    (tenant, token), so a multi-tenant corpus's unigram statistics
    come out domain-local in a single pass (the reference's
    per-searchdomain corpus semantics applied to token counts). Feeds
    the per-tenant vocabulary-drift monitor."""
    return (
        df.select(
            F.col(partition_col),
            F.explode(tokens(F.lower(F.col(text_col)))).alias("tok"),
        )
        .groupBy(partition_col, "tok")
        .agg(F.count(F.lit(1)).alias("c"))
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


def _doc_bigrams(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """One row per adjacent token pair (w1, w2), tokens lowercased —
    the slices read a materialized token column (HOF-lambda hoist
    convention), and the zip/explode is pure scan-stage."""
    staged = df.select(
        F.col(id_col),
        tokens(F.lower(F.col(text_col))).alias("_t"),
    )
    n = F.size("_t")
    idx = F.when(n >= 2, F.sequence(F.lit(1), n - 1)).otherwise(
        F.array().cast("array<int>")
    )
    pairs = F.transform(
        idx,
        lambda i: F.struct(
            F.element_at(F.col("_t"), i).alias("w1"),
            F.element_at(F.col("_t"), i + 1).alias("w2"),
        ),
    )
    return staged.select(
        F.col(id_col), F.explode(pairs).alias("_p")
    ).select(
        F.col(id_col),
        F.col("_p.w1").alias("w1"),
        F.col("_p.w2").alias("w2"),
    )


def bigram_scores(
    df: DataFrame,
    id_col: str,
    text_col: str,
    vocab_size: int = 65536,
    smoothing: float = 1.0,
    lam: float = 0.7,
    reference: DataFrame | None = None,
) -> DataFrame:
    """Interpolated bigram LM scoring (Jelinek–Mercer smoothing — the
    classic public recipe): p(w2|w1) = lam·c(w1,w2)/c(w1·) +
    (1-lam)·p_uni(w2), with the add-one unigram of `unigram_scores` as
    the backoff and c(w1·) the history count (= Σ_w2 c(w1,w2), derived
    FROM the bigram table — no extra corpus pass). Per-doc output:
    ``(id, n_bigrams, avg_nll, perplexity)``; docs with < 2 tokens score
    NULL and are omitted. ``reference`` scores ``df`` under another
    corpus's LM; unseen histories there fall back to the unigram term
    alone.

    Plan: ONE corpus bigram pass feeds both count tables; the doc
    stream joins c2 on the (w1, w2) key and c1 on w1 — both hash joins
    whose build sides are DISTINCT-bigram / distinct-token bounded
    (they saturate as the corpus grows but are NOT broadcast-safe on a
    web corpus, where distinct raw tokens alone reach hundreds of
    millions — AQE may still broadcast them when they fit). Only the
    top-``vocab_size`` unigram table carries an explicit broadcast.
    """
    ref = reference if reference is not None else df
    ref_bg = _doc_bigrams(ref, id_col, text_col)
    c2 = ref_bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    c1 = c2.groupBy("w1").agg(F.sum("c2").alias("c1"))
    vocab = unigram_vocab(ref, id_col, text_col, vocab_size)
    totals = (
        _doc_tokens(ref, id_col, text_col)
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()[0]
    )
    k = vocab.count()
    denom = float(totals["n"]) + smoothing * (k + 1)

    bg = _doc_bigrams(df, id_col, text_col)
    joined = (
        bg.join(c2, ["w1", "w2"], "left_outer")
        .join(c1, "w1", "left_outer")
        .join(
            F.broadcast(vocab.withColumnRenamed("tok", "w2")),
            "w2",
            "left_outer",
        )
    )
    p_uni = (F.coalesce("c", F.lit(0)) + F.lit(smoothing)) / F.lit(denom)
    p_big = F.when(
        F.col("c1").isNotNull() & (F.col("c1") > 0),
        F.coalesce("c2", F.lit(0)).cast("double") / F.col("c1"),
    ).otherwise(F.lit(0.0))
    nll = -F.log(F.lit(lam) * p_big + F.lit(1.0 - lam) * p_uni)
    return (
        joined.select(F.col(id_col), nll.alias("_nll"))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.avg("_nll").alias("avg_nll"),
        )
        .withColumn("perplexity", F.exp(F.col("avg_nll")))
    )


def perplexity_buckets_by(
    df: DataFrame,
    id_col: str,
    text_col: str,
    group_col: str,
    n_buckets: int = 3,
    vocab_size: int = 65536,
    smoothing: float = 1.0,
    reference: DataFrame | None = None,
) -> DataFrame:
    """`perplexity_buckets` PER GROUP — CCNet's actual shape (the
    head/middle/tail cut is per language, arXiv:1911.00359 §4.3):
    exact SQL ntile semantics within each group, but the rank comes
    from `assign_group_ranks` (range-partitioned two-pass), never a
    ``Window.partitionBy(group)`` that caps parallelism at the group
    count and collapses under one dominant language. Returns
    ``(id, group, perplexity, bucket, segment)``.

    The ntile arithmetic runs per row from (rank, group_total) with the
    tiny totals table broadcast — sizes differ per group, so size/rem
    are columns, not Python scalars.
    """
    from embeddingsearch_spark.constants import ROUND_DIGITS
    from embeddingsearch_spark.operators.ids import assign_group_ranks

    scored = (
        unigram_scores(
            df, id_col, text_col, vocab_size, smoothing, reference
        )
        .filter(F.col("avg_nll").isNotNull())
        .select(
            F.col(id_col),
            F.round("perplexity", ROUND_DIGITS).alias("perplexity"),
        )
        .join(df.select(id_col, group_col), id_col)
    )
    ranked, totals = assign_group_ranks(
        scored, group_col, ["perplexity", id_col], out_col="_rk"
    )
    # null-safe join: a NULL group (missing language/source) is a group
    # of its own and must not silently vanish through an equi-join
    j = ranked.join(
        F.broadcast(totals.withColumnRenamed(group_col, "_g")),
        F.col(group_col).eqNullSafe(F.col("_g")),
    ).drop("_g")
    t = F.col("group_total")
    r = F.col("_rk")
    size = F.floor(t / n_buckets)
    rem = t - size * n_buckets
    bucket = (
        F.when(size == 0, r + 1)
        .when(r < rem * (size + 1), F.floor(r / (size + 1)) + 1)
        .otherwise(rem + F.floor((r - rem * (size + 1)) / size) + 1)
    ).cast("int")
    names = {1: "head", 2: "middle", 3: "tail"} if n_buckets == 3 else {}
    out = j.select(
        id_col, group_col, "perplexity", bucket.alias("bucket")
    )
    segment = F.col("bucket").cast("string")
    for b, name in names.items():
        segment = F.when(F.col("bucket") == b, F.lit(name)).otherwise(
            segment
        )
    return out.withColumn("segment", segment)
