"""Trainable character-n-gram Naive Bayes language identification.

The stopword-marker heuristic (`functions.text.lang_id`) is fine as a
demo but cannot label real web text; the standard public recipe (CLD /
langid.py / fastText-style) is a multinomial Naive Bayes over character
n-grams. This module implements that recipe Spark-first:

- **train** (`charngram_lang_model`): one scan of a labeled corpus
  extracts char n-grams (scan-stage `sequence`/`transform`, no UDF),
  one hash aggregation counts them per language, the shared top-V gram
  vocabulary bounds the model, and the emitted model is a DENSE
  (lang × vocab-gram → log-prob) table of L·V rows — a few MB for
  hundreds of languages, broadcastable by construction.
- **predict** (`lang_id_predict`): the document stream joins the
  broadcast model on the gram key (the exact shape of
  `lmscore.unigram_scores`' vocab join), sums log-probs per (doc, lang)
  with map-side partial aggregation, adds the per-language OOV floor ×
  out-of-vocab gram count plus the log prior, and takes the argmax with
  a deterministic tiebreak. The corpus is never shuffled on anything
  wider than (doc_id, lang); the model never leaves the broadcast.

Smoothing is add-``smoothing`` over the vocabulary plus one OOV
pseudo-gram: p(g|lang) = (c + s) / (n_lang + s·(V+1)); grams outside
the vocabulary score the floor s / (n_lang + s·(V+1)).

All math in float64 with declared rounding (constants.ROUND_DIGITS)
before the argmax, ties broken by language code ascending — any engine
(the DuckDB oracle included) reproduces the prediction exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from embeddingsearch_spark.constants import ROUND_DIGITS


def charngram_extract(
    df: DataFrame, id_col: str, text_col: str, n: int = 3
) -> DataFrame:
    """One row per character n-gram occurrence of ``lower(text)``:
    ``(id_col, gram)``. Scan-stage only (sequence + transform +
    explode); texts shorter than ``n`` yield zero rows."""
    staged = df.select(
        F.col(id_col), F.lower(F.col(text_col)).alias("_t")
    )
    m = F.length("_t") - F.lit(n - 1)
    # sequence(1, 0) would yield a DESCENDING [1, 0] — guard short texts
    idx = F.when(m >= 1, F.sequence(F.lit(1), m)).otherwise(
        F.array().cast("array<int>")
    )
    # substring() needs a literal start; Column.substr takes a column
    grams = F.transform(
        idx, lambda i: F.col("_t").substr(i, F.lit(n))
    )
    return staged.select(
        F.col(id_col), F.explode(grams).alias("gram")
    )


def charngram_lang_model(
    df: DataFrame,
    id_col: str,
    text_col: str,
    label_col: str,
    n: int = 3,
    vocab_size: int = 4096,
    smoothing: float = 1.0,
) -> tuple[DataFrame, DataFrame]:
    """Train the NB model on a labeled corpus. Returns
    ``(model, langs)``:

    - ``model``: dense ``(lang, gram, logp)`` over the shared top-
      ``vocab_size`` gram vocabulary (count desc, gram asc tiebreak) —
      L·V rows, built once, meant to be broadcast at predict time.
    - ``langs``: tiny per-language table ``(lang, floor_logp,
      log_prior)`` — the OOV floor and the doc-frequency prior.

    One corpus scan feeds every aggregate; the vocabulary cut is a
    bounded TakeOrdered (V rows), never a global sort of the corpus.
    """
    grams = df.select(
        F.col(label_col).alias("lang"), F.col(id_col).alias("_id"),
        F.col(text_col).alias("_txt"),
    )
    g = charngram_extract(grams, "lang", "_txt", n=n).select(
        "lang", "gram"
    )
    # per-(lang, gram) counts: ONE shuffle with map-side combine. This
    # table is referenced by four downstream aggregates (vocab cut,
    # in-vocab counts, per-lang totals, dense model) — without pinning
    # it, EACH reference re-runs the corpus-sized gram explode (measured
    # 12 parquet scans / 0 reused exchanges on the naive plan). It is
    # distinct-(lang, gram)-bounded (charset^n × L, corpus-independent),
    # so materializing it costs one small write and caps training at a
    # single corpus pass.
    counts = (
        g.groupBy("lang", "gram")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=False)
    )
    # shared vocabulary: top-V grams by total count (ties → gram asc).
    # counts is already distinct-(lang,gram)-bounded; the re-agg and
    # V-row limit are tiny.
    vocab = (
        counts.groupBy("gram")
        .agg(F.sum("c").alias("_tot"))
        .orderBy(F.col("_tot").desc(), F.col("gram").asc())
        .limit(vocab_size)
        .select("gram")
    )
    in_vocab = counts.join(F.broadcast(vocab), "gram")
    n_lang = in_vocab.groupBy("lang").agg(F.sum("c").alias("n_lang"))
    # language list + doc-frequency priors from the SAME labeled frame.
    # One collect of the L-row per-lang table serves BOTH the priors
    # and the corpus total (ids are unique per row, so Σ per-lang
    # distinct = global distinct) — no separate corpus-wide distinct
    # pass.
    dc_rows = (
        grams.groupBy("lang")
        .agg(F.countDistinct("_id").alias("n_docs"))
        .collect()
    )
    total_docs = sum(r["n_docs"] for r in dc_rows)
    lang_type = grams.schema["lang"].dataType.simpleString()
    doc_counts = df.sparkSession.createDataFrame(
        [(r["lang"], r["n_docs"]) for r in dc_rows],
        f"lang {lang_type}, n_docs long",
    )
    denom = F.coalesce(F.col("n_lang"), F.lit(0)) + F.lit(
        smoothing * (vocab_size + 1)
    )
    langs = (
        doc_counts.join(n_lang, "lang", "left_outer")
        .select(
            "lang",
            F.log(F.lit(smoothing) / denom).alias("floor_logp"),
            F.log(
                F.col("n_docs").cast("double") / F.lit(float(total_docs))
            ).alias("log_prior"),
        )
    )
    # dense model: every (lang, vocab gram) pair gets a smoothed logp,
    # so predict-time scoring is a single equi-join on gram with no
    # per-language missing-row handling
    dense = (
        langs.select("lang")
        .crossJoin(F.broadcast(vocab))
        .join(in_vocab, ["lang", "gram"], "left_outer")
        .join(F.broadcast(n_lang), "lang", "left_outer")
        .select(
            "lang",
            "gram",
            F.log(
                (F.coalesce(F.col("c"), F.lit(0)) + F.lit(smoothing))
                / (
                    F.coalesce(F.col("n_lang"), F.lit(0))
                    + F.lit(smoothing * (vocab_size + 1))
                )
            ).alias("logp"),
        )
    )
    return dense, langs


def lang_id_predict(
    df: DataFrame,
    id_col: str,
    text_col: str,
    model: DataFrame,
    langs: DataFrame,
    n: int = 3,
) -> DataFrame:
    """Score every document under the trained model and return
    ``(id_col, lang_pred, score, n_grams)`` — one row per doc, argmax
    language with deterministic ties (score rounded to ROUND_DIGITS
    desc, lang asc).

    score(doc, lang) = log_prior(lang) + Σ_in-vocab logp(gram|lang)
    + n_oov · floor_logp(lang). The in-vocab gram count per doc is
    language-independent (the vocabulary is shared), so one join
    against the broadcast dense model yields both the per-language sum
    and the OOV count."""
    g = charngram_extract(df, id_col, text_col, n=n)
    iv = (
        g.join(F.broadcast(model), "gram")
        .groupBy(id_col, "lang")
        .agg(
            F.sum("logp").alias("_s_iv"),
            F.count(F.lit(1)).alias("_n_iv"),
        )
    )
    # n_grams is a pure function of text length — max(len - n + 1, 0) —
    # so derive it scan-side instead of aggregating the gram stream
    # (saves one full corpus scan + shuffle). base = every (doc, lang)
    # pair; docs with zero (or zero in-vocab) grams still get scored by
    # prior + all-OOV floor.
    base = df.select(
        F.col(id_col),
        F.greatest(
            F.length(F.lower(F.col(text_col))) - F.lit(n - 1), F.lit(0)
        )
        .cast("long")
        .alias("n_grams"),
    ).crossJoin(F.broadcast(langs))
    scores = base.join(iv, [id_col, "lang"], "left_outer").select(
        F.col(id_col),
        F.col("lang"),
        F.col("n_grams"),
        (
            F.col("log_prior")
            + F.coalesce(F.col("_s_iv"), F.lit(0.0))
            + (
                F.col("n_grams") - F.coalesce(F.col("_n_iv"), F.lit(0))
            )
            * F.col("floor_logp")
        ).alias("_score"),
    )
    # argmax folded INTO the aggregation (min_by over (-rounded, lang):
    # highest rounded score, ties -> lang asc) — no per-doc rank window,
    # so the (doc, lang) frame needs no extra sort after the aggregation
    rounded = F.round(F.col("_score"), ROUND_DIGITS)
    winner = F.min_by(
        F.struct(
            F.col("lang").alias("lang_pred"),
            rounded.alias("score"),
            F.col("n_grams").alias("n_grams"),
        ),
        F.struct(
            (-rounded).alias("ns"), F.col("lang").alias("l")
        ),
    )
    return scores.groupBy(id_col).agg(winner.alias("_w")).select(
        id_col, "_w.lang_pred", "_w.score", "_w.n_grams"
    )
