"""Corpus drift detection between two snapshots.

A production data pipeline re-crawls, re-filters, and re-mixes; the
monitoring question is "did this batch's DISTRIBUTION move?" before the
shift poisons training. Two public, declarative measures:

- **Vocabulary drift** (`vocab_drift`): Jensen–Shannon divergence
  between the two corpora's top-V token distributions, plus the
  per-token probability ratios that explain WHERE the shift is. JS
  (symmetric, bounded [0, ln 2]) over a shared top-V vocabulary with
  add-one smoothing so new/vanished tokens stay finite.
- **Embedding drift** (`embedding_drift`): per-dimension mean shift
  between two embedding snapshots — ‖μ_a − μ_b‖₂ and the top drifted
  dimensions. One aggregation per side; d-sized results.

Both are one-pass-per-corpus aggregations with vocabulary/dimension-
bounded outputs — monitoring must stay cheaper than the pipeline it
watches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from embeddingsearch_spark.constants import ROUND_DIGITS


def _token_counts(df: DataFrame, text_col: str) -> DataFrame:
    # ONE definition of unigram counting (lmscore) — shared so drift
    # and LM scoring can't silently diverge on tokenization
    from embeddingsearch_spark.operators.lmscore import (
        corpus_token_counts,
    )

    return corpus_token_counts(df, text_col)


def vocab_drift(
    corpus_a: DataFrame,
    corpus_b: DataFrame,
    text_col: str = "text",
    vocab_size: int = 4096,
    smoothing: float = 1.0,
) -> tuple[DataFrame, DataFrame]:
    """Returns ``(summary, per_token)``:

    - summary: one row — ``(js_divergence, n_vocab, n_a, n_b)``;
    - per_token: ``(tok, p_a, p_b, log_ratio)`` over the shared top-V
      vocabulary (by combined count, ties token asc), log_ratio =
      ln(p_a/p_b) — positive means over-represented in A.

    Probabilities are add-``smoothing`` smoothed over V+1 (the +1 is
    the out-of-vocabulary bucket, same convention as the language-ID
    model), so the divergence is finite for tokens present in only one
    corpus."""
    ca = _token_counts(corpus_a, text_col)
    cb = _token_counts(corpus_b, text_col)
    return vocab_drift_from_counts(
        ca, cb, vocab_size=vocab_size, smoothing=smoothing
    )


def vocab_drift_from_counts(
    ca: DataFrame,
    cb: DataFrame,
    vocab_size: int = 4096,
    smoothing: float = 1.0,
) -> tuple[DataFrame, DataFrame]:
    """`vocab_drift` over pre-computed ``(tok, c)`` count frames — the
    core the streaming monitor reuses so a running count table (merged
    across micro-batches) can be diffed against a reference snapshot
    without re-scanning either corpus."""
    merged = (
        ca.withColumnRenamed("c", "ca")
        .join(cb.withColumnRenamed("c", "cb"), "tok", "full_outer")
        .select(
            "tok",
            F.coalesce("ca", F.lit(0)).alias("ca"),
            F.coalesce("cb", F.lit(0)).alias("cb"),
        )
        # distinct-token bounded, read by the vocab cut AND the scoring
        .localCheckpoint(eager=False)
    )
    vocab = (
        merged.withColumn("_tot", F.col("ca") + F.col("cb"))
        .orderBy(F.col("_tot").desc(), F.col("tok").asc())
        .limit(vocab_size)
        .select("tok", "ca", "cb")
    )
    totals = merged.agg(
        F.sum("ca").alias("na"), F.sum("cb").alias("nb")
    ).collect()[0]
    n_a, n_b = float(totals["na"] or 0), float(totals["nb"] or 0)
    denom_a = n_a + smoothing * (vocab_size + 1)
    denom_b = n_b + smoothing * (vocab_size + 1)
    p_a = (F.col("ca") + F.lit(smoothing)) / F.lit(denom_a)
    p_b = (F.col("cb") + F.lit(smoothing)) / F.lit(denom_b)
    m = (p_a + p_b) / 2
    contrib = (
        p_a * F.log(p_a / m) / 2 + p_b * F.log(p_b / m) / 2
    )
    per_token = vocab.select(
        "tok",
        F.round(p_a, ROUND_DIGITS).alias("p_a"),
        F.round(p_b, ROUND_DIGITS).alias("p_b"),
        F.round(F.log(p_a / p_b), ROUND_DIGITS).alias("log_ratio"),
        contrib.alias("_js"),
    )
    summary = per_token.agg(
        F.round(F.sum("_js"), ROUND_DIGITS).alias("js_divergence"),
        F.count(F.lit(1)).alias("n_vocab"),
        F.lit(int(n_a)).cast("long").alias("n_a"),
        F.lit(int(n_b)).cast("long").alias("n_b"),
    )
    return summary, per_token.drop("_js")


def vocab_drift_federated_from_counts(
    ca: DataFrame,
    cb: DataFrame,
    partition_col: str = "source",
    vocab_size: int = 4096,
    smoothing: float = 1.0,
) -> DataFrame:
    """`vocab_drift_from_counts` PER COLLECTION: both inputs are
    ``(partition_col, tok, c)`` frames (run counts vs a pinned
    per-tenant reference — `corpus_token_counts_federated`'s shape);
    the output is one row per collection present on EITHER side:
    ``(partition_col, js_divergence, n_vocab, n_a, n_b)``. Everything
    stays distributed: the vocabulary cut is a per-tenant rank window
    (top ``vocab_size`` tokens by combined count, token-string
    tie-break — the deterministic-cut convention), the per-tenant
    totals join back as columns instead of collecting, and the JS sum
    collapses per tenant — so one aggregate serves every searchdomain
    at once, the lexical twin of `embedding_drift_federated`. A
    collection's divergence is computed against ITS OWN reference
    counts only; a tenant absent from the reference diverges against
    an empty (all-smoothing) distribution — loud, which is correct
    for an un-onboarded feed."""
    from pyspark.sql import Window

    pc = partition_col
    merged = (
        ca.withColumnRenamed("c", "ca")
        .join(
            cb.withColumnRenamed("c", "cb"), [pc, "tok"], "full_outer"
        )
        .select(
            pc,
            "tok",
            F.coalesce("ca", F.lit(0)).alias("ca"),
            F.coalesce("cb", F.lit(0)).alias("cb"),
        )
        .localCheckpoint(eager=False)
    )
    w = Window.partitionBy(pc).orderBy(
        (F.col("ca") + F.col("cb")).desc(), F.col("tok").asc()
    )
    vocab = (
        merged.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= vocab_size)
        .drop("_rk")
    )
    totals = merged.groupBy(pc).agg(
        F.sum("ca").alias("_na"), F.sum("cb").alias("_nb")
    )
    j = vocab.join(F.broadcast(totals), pc)
    denom_a = F.col("_na") + smoothing * (vocab_size + 1)
    denom_b = F.col("_nb") + smoothing * (vocab_size + 1)
    p_a = (F.col("ca") + F.lit(smoothing)) / denom_a
    p_b = (F.col("cb") + F.lit(smoothing)) / denom_b
    m = (p_a + p_b) / 2
    contrib = p_a * F.log(p_a / m) / 2 + p_b * F.log(p_b / m) / 2
    return j.groupBy(pc).agg(
        F.round(F.sum(contrib), ROUND_DIGITS).alias("js_divergence"),
        F.count(F.lit(1)).alias("n_vocab"),
        F.max("_na").cast("long").alias("n_a"),
        F.max("_nb").cast("long").alias("n_b"),
    )


def embedding_drift(
    emb_a: DataFrame,
    emb_b: DataFrame,
    vec_col: str = "embedding",
    top_dims: int = 8,
) -> tuple[DataFrame, DataFrame]:
    """Returns ``(summary, per_dim)``:

    - summary: ``(mean_shift_l2, n_a, n_b)`` — ‖μ_a − μ_b‖₂;
    - per_dim: the ``top_dims`` most-shifted dimensions
      ``(dim, mean_a, mean_b, shift)``.

    One posexplode + aggregation per side (d-bounded output)."""
    def dim_means(df, side):
        return (
            df.select(
                F.posexplode(F.col(vec_col).cast("array<double>")).alias(
                    "dim", "x"
                )
            )
            .groupBy("dim")
            .agg(
                F.avg("x").alias(f"mean_{side}"),
                F.count(F.lit(1)).alias(f"n_{side}"),
            )
        )

    # d-bounded; pinned so collecting BOTH returned frames costs one
    # posexplode pass per side, not two (the vocab_drift convention)
    j = (
        dim_means(emb_a, "a")
        .join(dim_means(emb_b, "b"), "dim")
        .localCheckpoint(eager=False)
    )
    shift = F.col("mean_a") - F.col("mean_b")
    per_dim = (
        j.select(
            "dim",
            F.round("mean_a", ROUND_DIGITS).alias("mean_a"),
            F.round("mean_b", ROUND_DIGITS).alias("mean_b"),
            F.round(F.abs(shift), ROUND_DIGITS).alias("shift"),
        )
        .orderBy(F.col("shift").desc(), F.col("dim").asc())
        .limit(top_dims)
    )
    summary = j.agg(
        F.round(
            F.sqrt(F.sum(shift * shift)), ROUND_DIGITS
        ).alias("mean_shift_l2"),
        (F.max("n_a")).alias("n_a"),
        (F.max("n_b")).alias("n_b"),
    )
    return summary, per_dim


def embedding_drift_federated(
    emb_a: DataFrame,
    emb_b: DataFrame,
    partition_col: str = "source",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-collection embedding drift in ONE pass per side:
    ``(collection, mean_shift_l2, n_a, n_b)`` — ‖μ_a − μ_b‖₂ computed
    within each collection, so the monitor scopes a retrain's blast
    radius to the DRIFTED searchdomain(s) instead of flagging the
    whole index (the multi-tenant IVF's monitor arm: one tenant's
    distribution shift triggers re-quantization of that tenant only —
    `retrain_federated_ivf_tenants`). Collections present on one side
    only are reported with the other side's count 0 and a NULL shift
    (no basis for comparison — onboarding, not drift). Output is
    (collections × d)-bounded before the final collapse."""

    def dim_means(df, side):
        return (
            df.select(
                F.col(partition_col),
                F.posexplode(
                    F.col(vec_col).cast("array<double>")
                ).alias("dim", "x"),
            )
            .groupBy(partition_col, "dim")
            .agg(
                F.avg("x").alias(f"mean_{side}"),
                F.count(F.lit(1)).alias(f"n_{side}"),
            )
        )

    j = dim_means(emb_a, "a").join(
        dim_means(emb_b, "b"), [partition_col, "dim"], "full_outer"
    )
    shift = F.col("mean_a") - F.col("mean_b")
    return j.groupBy(partition_col).agg(
        F.round(F.sqrt(F.sum(shift * shift)), ROUND_DIGITS).alias(
            "mean_shift_l2"
        ),
        F.coalesce(F.max("n_a"), F.lit(0)).alias("n_a"),
        F.coalesce(F.max("n_b"), F.lit(0)).alias("n_b"),
    )
