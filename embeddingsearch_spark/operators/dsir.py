"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
arXiv:2302.03169 — public): select raw-corpus documents whose hashed
n-gram distribution looks like a target corpus.

    1. featurize: unigrams + bigrams hashed into B buckets
    2. fit bag-of-words bucket models on target and raw (Laplace-smoothed)
    3. log importance weight per doc: Σ_b c_b(x) · ln(p̂_t[b] / p̂_r[b])
    4. resample via Gumbel-top-k — equivalent to weighted sampling
       without replacement with probability ∝ w(x)

Spark-first shape at 100 TB: featurization is a scan-stage explode;
each model is ONE map-side-combinable groupBy collapsing to exactly B
rows; the weight join broadcasts the two B-row models onto the bucket
counts (never shuffling text); selection is a rank over (score, id).
Every stage is deterministic — the bucket hash is a sha256 window and
the Gumbel noise derives from sha256(id | seed) — so an independent
engine (the DuckDB oracle) reproduces weights and selection exactly.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from embeddingsearch_spark.constants import ROUND_DIGITS
from embeddingsearch_spark.functions.text import tokens

DEFAULT_BUCKETS = 4096


def _bucket(col, buckets: int, hash_fn: str = "sha256"):
    """Gram → bucket id. ``sha256`` (default): first 15 hex chars are a
    60-bit integer in any engine — cross-engine reproducible, the
    DuckDB-oracle path. ``xxhash64``: JVM-native, measured ~2× faster on
    the hash-bound featurization (the `minhash_signatures` precedent) —
    Spark-specific buckets, so no cross-engine oracle; the selection
    semantics are unchanged (weights shift within hash noise)."""
    if hash_fn == "xxhash64":
        return F.pmod(F.xxhash64(col), F.lit(buckets))
    if hash_fn != "sha256":
        raise ValueError("hash_fn must be 'sha256' or 'xxhash64'")
    h = F.conv(F.substring(F.sha2(col, 256), 1, 15), 16, 10).cast("bigint")
    return F.pmod(h, F.lit(buckets))


def hashed_ngram_buckets(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = DEFAULT_BUCKETS,
    hash_fn: str = "sha256",
) -> DataFrame:
    """(id, bucket, c): hashed unigram+bigram counts per doc — DSIR's
    featurization. One scan-stage explode; text never shuffles."""
    # tokens materialized as a column first: element_at(<expr>, i) inside
    # the bigram lambda would re-run tokenization once per bigram (the
    # word_shingles_of hazard, O(n²) per doc)
    staged = df.select(
        F.col(id_col), tokens(F.lower(F.col(text_col))).alias("_toks")
    )
    toks = F.col("_toks")
    # guard: sequence(0, -1) is a DESCENDING [0, -1] in Spark, not empty,
    # so <2-token docs must skip the bigram branch explicitly
    bigrams = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - 2),
            lambda i: F.concat_ws(
                " ", F.element_at(toks, i + 1), F.element_at(toks, i + 2)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    grams = F.concat(toks, bigrams)
    return (
        staged.select(F.col(id_col), F.explode(grams).alias("gram"))
        .select(
            id_col,
            _bucket(F.col("gram"), buckets, hash_fn).alias("bucket"),
        )
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def bow_log_probs(
    feats: DataFrame, buckets: int = DEFAULT_BUCKETS, alpha: float = 1.0
) -> DataFrame:
    """(bucket, logp): Laplace-smoothed bucket log-probabilities of one
    corpus — exactly B rows (broadcastable)."""
    tot = feats.agg(F.sum("c").alias("_tot"))
    return (
        feats.groupBy("bucket")
        .agg(F.sum("c").alias("cb"))
        .crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            F.log(
                (F.col("cb") + F.lit(alpha))
                / (F.col("_tot") + F.lit(alpha * buckets))
            ).alias("logp"),
        )
    )


def importance_log_weights(
    raw: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = DEFAULT_BUCKETS,
    alpha: float = 1.0,
    hash_fn: str = "sha256",
) -> DataFrame:
    """(id, log_w): per-raw-doc log importance weight under the
    target/raw bucket models. Buckets absent from a model contribute
    the smoothing floor ln(α / (tot + αB)) — the same closed form the
    models assign any unseen bucket."""
    # each feature table feeds its model, its total, and (raw) the weight
    # join — materialize once so the corpus-sized explode+hash pass runs
    # once per corpus, not once per consumer
    raw_feats = hashed_ngram_buckets(
        raw, id_col, text_col, buckets, hash_fn
    ).localCheckpoint(eager=True)
    t_feats = hashed_ngram_buckets(
        target, id_col, text_col, buckets, hash_fn
    ).localCheckpoint(eager=True)
    t_model = bow_log_probs(t_feats, buckets, alpha)
    r_model = bow_log_probs(raw_feats, buckets, alpha)
    t_tot = t_feats.agg(F.sum("c").alias("t"))
    r_tot = raw_feats.agg(F.sum("c").alias("t"))
    floor_t = F.log(
        F.lit(alpha) / (F.col("_tt") + F.lit(alpha * buckets))
    )
    floor_r = F.log(
        F.lit(alpha) / (F.col("_rt") + F.lit(alpha * buckets))
    )
    return (
        raw_feats.join(F.broadcast(t_model), "bucket", "left")
        .join(
            F.broadcast(r_model.withColumnRenamed("logp", "logp_r")),
            "bucket",
            "left",
        )
        .crossJoin(
            F.broadcast(t_tot.select(F.col("t").alias("_tt")))
        )
        .crossJoin(
            F.broadcast(r_tot.select(F.col("t").alias("_rt")))
        )
        .select(
            id_col,
            (
                F.col("c")
                * (
                    F.coalesce(F.col("logp"), floor_t)
                    - F.coalesce(F.col("logp_r"), floor_r)
                )
            ).alias("_term"),
        )
        .groupBy(id_col)
        .agg(F.sum("_term").alias("log_w"))
    )


def gumbel_key(id_col, seed: int = 42):
    """Deterministic Gumbel(0,1) noise from sha256(id | seed): u ∈ (0,1)
    from a 60-bit hash window, g = -ln(-ln(u)). Seeded hash noise makes
    Gumbel-top-k a pure function of the data — reproducible across
    engines and retries (the DuckDB oracle replays it bit-for-bit)."""
    h = F.conv(
        F.substring(
            F.sha2(F.concat_ws("|", id_col.cast("string"), F.lit(str(seed))), 256),
            1,
            15,
        ),
        16,
        10,
    ).cast("bigint")
    u = (h.cast("double") + 0.5) / float(1 << 60)
    return -F.log(-F.log(u))


def dsir_select(
    raw: DataFrame,
    target: DataFrame,
    n: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = DEFAULT_BUCKETS,
    alpha: float = 1.0,
    seed: int = 42,
    hash_fn: str = "sha256",
) -> DataFrame:
    """Top-``n`` Gumbel-perturbed importance selection — DSIR's sampling
    step (Gumbel-top-k ≡ weighted sampling without replacement, prob
    ∝ w). Returns (id, log_w, rank), rank 1..n by rounded perturbed
    score desc, id asc."""
    lw = importance_log_weights(
        raw, target, id_col, text_col, buckets, alpha, hash_fn
    )
    score = F.round(
        F.col("log_w") + gumbel_key(F.col(id_col), seed), ROUND_DIGITS
    )
    # distributed top-k (TakeOrderedAndProject), NOT a global window —
    # a single-partition sort of the raw corpus would be the 100-TB
    # bottleneck; only the n survivors are ranked
    picked = (
        lw.withColumn("_score", score)
        .orderBy(F.col("_score").desc(), F.col(id_col).asc())
        .limit(n)
    )
    # single-partition window over the n survivors only — bounded by
    # construction. (A literal partition key would NOT silence the
    # WindowExec warning: the optimizer constant-folds it away; the
    # bench filters that known-benign warning at the log level.)
    w = Window.orderBy(F.col("_score").desc(), F.col(id_col).asc())
    return (
        picked.withColumn("rank", F.row_number().over(w))
        .select(
            id_col,
            F.round("log_w", ROUND_DIGITS).alias("log_w"),
            "rank",
        )
    )
