"""Text-analysis queries over the documents table: token counting, quality
scoring, heuristic language-ID, content fingerprinting (the text half of
the LLM-data-pipeline surface)."""

from __future__ import annotations

from pyspark.sql import functions as F

from embeddingsearch_spark import tables
from embeddingsearch_spark.constants import ROUND_DIGITS as RD
from embeddingsearch_spark.functions import text as T
from embeddingsearch_spark.operators import (
    contamination,
    packing,
    repetition,
    splits,
)

TOKS_SQL = r"""CASE WHEN length(trim(text)) = 0 THEN []
  ELSE regexp_split_to_array(trim(text), '\s+') END"""


def q_token_count(spark, sf_dir):
    docs = tables.load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        T.token_count(F.col("text")).alias("n_tokens"),
        F.length("text").alias("n_chars_computed"),
    )


TOKEN_COUNT_SQL = f"""
SELECT doc_id,
       len({TOKS_SQL}) AS n_tokens,
       length(text) AS n_chars_computed
FROM documents"""


def q_bpe_token_count(spark, sf_dir):
    """Whitespace vs BPE-ish token counts per doc — the LLM token-budget
    estimate (pure regexp_extract_all, scan-stage)."""
    docs = tables.load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        T.token_count(F.col("text")).alias("n_ws_tokens"),
        T.bpe_token_count(F.col("text")).alias("n_bpe_tokens"),
    )


BPE_TOKEN_COUNT_SQL = f"""
SELECT doc_id,
       len({TOKS_SQL}) AS n_ws_tokens,
       len(regexp_extract_all(text,
           '''(?:s|t|re|ve|m|ll|d)| ?[\\p{{L}}]+| ?[\\p{{N}}]+| ?[^\\s\\p{{L}}\\p{{N}}]+'))
         AS n_bpe_tokens
FROM documents"""


def q_quality_score(spark, sf_dir):
    docs = tables.load(spark, sf_dir, "documents")
    m = T.quality_metrics(F.col("text"))
    return docs.select(
        "doc_id",
        F.round(m["punct_ratio"], RD).alias("punct_ratio"),
        F.round(m["digit_ratio"], RD).alias("digit_ratio"),
        F.round(m["space_ratio"], RD).alias("space_ratio"),
        F.round(m["stopword_ratio"], RD).alias("stopword_ratio"),
        F.round(m["avg_token_len"], RD).alias("avg_token_len"),
    )


QUALITY_SCORE_SQL = rf"""
SELECT doc_id,
  round((length(text) - length(regexp_replace(text, '[^\p{{L}}\p{{N}}\s]', '', 'g')))
        / CASE WHEN length(text) = 0 THEN 1.0 ELSE CAST(length(text) AS DOUBLE) END,
        {RD}) AS punct_ratio,
  round((length(text) - length(regexp_replace(text, '[0-9]', '', 'g')))
        / CASE WHEN length(text) = 0 THEN 1.0 ELSE CAST(length(text) AS DOUBLE) END,
        {RD}) AS digit_ratio,
  round((length(text) - length(regexp_replace(text, '\s', '', 'g')))
        / CASE WHEN length(text) = 0 THEN 1.0 ELSE CAST(length(text) AS DOUBLE) END,
        {RD}) AS space_ratio,
  round(CASE WHEN len({TOKS_SQL}) = 0 THEN 0.0
        ELSE CAST(len(list_filter({{LOWER_TOKS}}, t -> list_contains([{{SW}}], t)))
                  AS DOUBLE) / len({TOKS_SQL}) END, {RD}) AS stopword_ratio,
  round(CASE WHEN len({TOKS_SQL}) = 0 THEN 0.0
        ELSE (CAST(length(text) AS DOUBLE)
              - (length(text) - length(regexp_replace(text, '\s', '', 'g'))))
             / len({TOKS_SQL}) END, {RD}) AS avg_token_len
FROM documents"""

from embeddingsearch_spark.functions.text import STOPWORDS as _SW_LIST

QUALITY_SCORE_SQL = QUALITY_SCORE_SQL.replace(
    "{LOWER_TOKS}", TOKS_SQL.replace("text", "lower(text)")
).replace("{SW}", ", ".join(f"'{w}'" for w in _SW_LIST))


def q_lang_id(spark, sf_dir):
    docs = tables.load(spark, sf_dir, "documents")
    return docs.select("doc_id", T.lang_id(F.col("text")).alias("lang_pred"))


def _score_sql(markers: list[str]) -> str:
    arr = ", ".join(f"'{m}'" for m in markers)
    return (
        f"len(list_filter({TOKS_SQL.replace('text', 'lower(text)')}, "
        f"t -> list_contains([{arr}], t)))"
    )


_S = {lang: _score_sql(m) for lang, m in T.LANG_MARKERS.items()}

LANG_ID_SQL = f"""
SELECT doc_id,
  CASE WHEN greatest({_S['de']}, {_S['en']}, {_S['es']}, {_S['fr']}) = 0 THEN 'und'
       WHEN {_S['de']} >= {_S['en']} AND {_S['de']} >= {_S['es']}
            AND {_S['de']} >= {_S['fr']} THEN 'de'
       WHEN {_S['en']} >= {_S['es']} AND {_S['en']} >= {_S['fr']} THEN 'en'
       WHEN {_S['es']} >= {_S['fr']} THEN 'es'
       ELSE 'fr' END AS lang_pred
FROM documents"""


def q_lang_id_model(spark, sf_dir):
    """TRAINED language ID (char-trigram Naive Bayes, the public
    CLD/langid.py recipe) with a REAL held-out measurement: train on
    the even-doc_id half of the realistic derived corpus (Zipfian
    vocabulary, per-language character distributions — suite/
    realistic.py), predict the odd half, and emit per-doc
    ``(doc_id, lang_true, lang_pred, correct, score, n_grams)`` so the
    gate itself shows the model's holdout accuracy. Dense broadcast
    model (L langs × 1024 grams), scan-side scoring, one (doc, lang)
    aggregation with the argmax folded in. The oracle replays the
    corpus derivation, train AND predict (vocab cut, smoothing, OOV
    floor, prior, argmax tiebreak) as chained CTEs."""
    _langid_model_setup(spark, sf_dir)
    return _langid_model_serve(spark, sf_dir)


def _langid_model_setup(spark, sf_dir):
    """Train the NB on the even half and PERSIST the two model tables
    — the artifact a production language-ID serve keeps hot (the
    bench's untimed setup leg; training is build-time work)."""
    from embeddingsearch_spark.operators import langid as langid_ops
    from embeddingsearch_spark.storage import drop_table
    from embeddingsearch_spark.suite.realistic import (
        derive_realistic_docs,
    )

    rd = derive_realistic_docs(spark, sf_dir)
    train = rd.filter(F.col("doc_id") % 2 == 0)
    dense, langs = langid_ops.charngram_lang_model(
        train, "doc_id", "text", "lang", n=3, vocab_size=1024
    )
    drop_table(spark, "es_gate_langid_model")
    dense.write.saveAsTable("es_gate_langid_model")
    drop_table(spark, "es_gate_langid_langs")
    langs.write.saveAsTable("es_gate_langid_langs")


def _langid_model_serve(spark, sf_dir):
    from embeddingsearch_spark.operators import langid as langid_ops
    from embeddingsearch_spark.suite.realistic import (
        derive_realistic_docs,
    )

    test = derive_realistic_docs(spark, sf_dir).filter(
        F.col("doc_id") % 2 == 1
    )
    pred = langid_ops.lang_id_predict(
        test, "doc_id", "text",
        spark.table("es_gate_langid_model"),
        spark.table("es_gate_langid_langs"),
        n=3,
    )
    return pred.join(
        test.select("doc_id", F.col("lang").alias("lang_true")),
        "doc_id",
    ).select(
        "doc_id",
        "lang_true",
        "lang_pred",
        (F.col("lang_pred") == F.col("lang_true"))
        .cast("int")
        .alias("correct"),
        "score",
        "n_grams",
    )


def nb_langid_ctes(
    train_cte: str = "d",
    predict_cte: str = "te",
    pid: str = "doc_id",
    vocab: int = 1024,
) -> str:
    """The char-trigram NB oracle chain as reusable CTEs: trains on
    ``train_cte`` (cols: doc_id, t, lang), predicts ``predict_cte``
    (cols: {pid}, t), ends in ``pred({pid}, lang_pred, score,
    n_grams)``. Shared by `lang_id_model` and the language-routed
    retrieval query so the replayed recipe cannot drift between them."""
    gram = """unnest(list_transform(range(1, greatest(0, length(t) - 2) + 1),
                               i -> substr(t, i, 3))) AS gram"""
    vp1 = float(vocab + 1)
    return f"""g AS (SELECT doc_id, lang, {gram} FROM {train_cte}),
c AS (SELECT lang, gram, count(*) AS c FROM g GROUP BY lang, gram),
vocab AS (
  SELECT gram FROM (
    SELECT gram, sum(c) AS tot FROM c GROUP BY gram
    ORDER BY tot DESC, gram ASC LIMIT {vocab})
),
nl AS (
  SELECT lang, sum(c) AS n_lang FROM c JOIN vocab USING (gram)
  GROUP BY lang
),
ld AS (SELECT lang, count(DISTINCT doc_id) AS n_docs FROM {train_cte}
       GROUP BY lang),
nd AS (SELECT count(DISTINCT doc_id) AS total FROM {train_cte}),
lng AS (
  SELECT ld.lang,
         ln(1.0 / (coalesce(nl.n_lang, 0) + {vp1})) AS floor_logp,
         ln(ld.n_docs * 1.0 / nd.total) AS log_prior
  FROM ld LEFT JOIN nl USING (lang), nd
),
dense AS (
  SELECT l.lang, v.gram,
         ln((coalesce(c.c, 0) + 1.0)
            / (coalesce(nl.n_lang, 0) + {vp1})) AS logp
  FROM (SELECT lang FROM ld) l
  CROSS JOIN vocab v
  LEFT JOIN nl ON nl.lang = l.lang
  LEFT JOIN c ON c.lang = l.lang AND c.gram = v.gram
),
gte AS (SELECT {pid}, {gram} FROM {predict_cte}),
iv AS (
  SELECT gte.{pid}, dense.lang, sum(dense.logp) AS s_iv,
         count(*) AS n_iv
  FROM gte JOIN dense USING (gram) GROUP BY gte.{pid}, dense.lang
),
base AS (
  SELECT dd.{pid}, l.lang, dd.n_grams
  FROM (SELECT {pid}, greatest(0, length(t) - 2) AS n_grams
        FROM {predict_cte}) dd
  CROSS JOIN (SELECT lang FROM ld) l
),
scores AS (
  SELECT b.{pid}, b.lang, b.n_grams,
         lg.log_prior + coalesce(iv.s_iv, 0)
         + (b.n_grams - coalesce(iv.n_iv, 0)) * lg.floor_logp AS score
  FROM base b
  JOIN lng lg ON lg.lang = b.lang
  LEFT JOIN iv ON iv.{pid} = b.{pid} AND iv.lang = b.lang
),
pred AS (
  SELECT {pid}, lang AS lang_pred, round(score, {RD}) AS score,
         n_grams
  FROM (
    SELECT *, row_number() OVER (PARTITION BY {pid}
              ORDER BY round(score, {RD}) DESC, lang ASC) AS rn
    FROM scores)
  WHERE rn = 1
)"""


def _lang_id_model_sql() -> str:
    from embeddingsearch_spark.suite.realistic import RD_SQL

    return f"""WITH {RD_SQL},
d AS (
  SELECT doc_id, lower(coalesce(text, '')) AS t, lang FROM rd
  WHERE doc_id % 2 = 0
),
te AS (
  SELECT doc_id, lower(coalesce(text, '')) AS t, lang FROM rd
  WHERE doc_id % 2 = 1
),
{nb_langid_ctes("d", "te", "doc_id", 1024)}
SELECT p.doc_id, t2.lang AS lang_true, p.lang_pred,
       CAST(p.lang_pred = t2.lang AS INT) AS correct,
       p.score, p.n_grams
FROM pred p JOIN (SELECT doc_id, lang FROM te) t2 USING (doc_id)"""


LANG_ID_MODEL_SQL = _lang_id_model_sql()


def q_quality_quantiles(spark, sf_dir):
    """Exact corpus quantiles (p10/p50/p90 of token and char counts)
    via the range-partitioned two-pass rank — no approx_percentile
    (engine-specific error, not oracle-able), no single-partition sort.
    Nearest-rank-low semantics: value at floor(q·(n−1)) ascending."""
    from embeddingsearch_spark.operators.quantiles import exact_quantiles

    docs = tables.load(spark, sf_dir, "documents")
    m = docs.select(
        "doc_id",
        T.token_count(F.col("text")).cast("double").alias("n_tokens"),
        F.length("text").cast("double").alias("n_chars"),
    )
    return exact_quantiles(
        m, ["n_tokens", "n_chars"], [0.1, 0.5, 0.9], "doc_id"
    )


def _qq_metric_sql(metric: str) -> str:
    return f"""SELECT '{metric}' AS metric, qq.q,
       (SELECT v FROM (
          SELECT {metric} AS v,
                 row_number() OVER (ORDER BY {metric}, doc_id) - 1 AS rk
          FROM m WHERE {metric} IS NOT NULL)
        WHERE rk = CAST(floor(qq.q * (
          (SELECT count(*) FROM m WHERE {metric} IS NOT NULL) - 1)
          + 0.000000001) AS BIGINT)) AS value
FROM (VALUES (0.1), (0.5), (0.9)) qq(q)"""


QUALITY_QUANTILES_SQL = f"""WITH m AS (
  SELECT doc_id,
         CAST(len({TOKS_SQL}) AS DOUBLE) AS n_tokens,
         CAST(length(text) AS DOUBLE) AS n_chars
  FROM documents
)
{_qq_metric_sql("n_tokens")}
UNION ALL
{_qq_metric_sql("n_chars")}"""


def q_vocab_drift(spark, sf_dir):
    """Distribution-shift monitor between two corpus snapshots (even vs
    odd doc ids): per-token smoothed probabilities and log-ratios over
    the shared top-1024 vocabulary — the table that explains WHERE a
    re-crawl's distribution moved. One token-count pass per side,
    vocabulary-bounded output."""
    from embeddingsearch_spark.operators.drift import vocab_drift

    docs = tables.load(spark, sf_dir, "documents")
    a = docs.filter(F.col("doc_id") % 2 == 0)
    b = docs.filter(F.col("doc_id") % 2 == 1)
    _, per_token = vocab_drift(a, b, vocab_size=1024)
    return per_token


def q_source_quality_profile(spark, sf_dir):
    """The per-source quality dashboard every pipeline run publishes:
    doc/token counts, token-length stats, and mean stopword ratio per
    (source, lang) — one scan, one hash aggregation, output bounded by
    the source×lang cardinality."""
    docs = tables.load(spark, sf_dir, "documents")
    m = T.quality_metrics(F.col("text"))
    staged = docs.select(
        "source",
        "lang",
        m["n_tokens"].alias("_nt"),
        m["stopword_ratio"].alias("_sw"),
    )
    return staged.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("_nt").alias("total_tokens"),
        F.round(F.avg("_nt"), RD).alias("mean_tokens"),
        F.min("_nt").alias("min_tokens"),
        F.max("_nt").alias("max_tokens"),
        F.round(F.avg("_sw"), RD).alias("mean_stopword_ratio"),
    )


_SQP_LTOKS = TOKS_SQL.replace("text", "lower(text)")


def _sqp_sql() -> str:
    from embeddingsearch_spark.functions.text import STOPWORDS

    sw = ", ".join(f"'{w}'" for w in STOPWORDS)
    return f"""WITH m AS (
  SELECT source, lang,
         CAST(len({TOKS_SQL}) AS BIGINT) AS nt,
         CASE WHEN len({TOKS_SQL}) = 0 THEN 0.0
              ELSE CAST(len(list_filter({_SQP_LTOKS},
                          t -> list_contains([{sw}], t))) AS DOUBLE)
                   / len({TOKS_SQL}) END AS sw
  FROM documents
)
SELECT source, lang, count(*) AS n_docs,
       CAST(sum(nt) AS BIGINT) AS total_tokens,
       round(avg(nt), {RD}) AS mean_tokens,
       min(nt) AS min_tokens, max(nt) AS max_tokens,
       round(avg(sw), {RD}) AS mean_stopword_ratio
FROM m GROUP BY source, lang"""


_VD_LTOKS = TOKS_SQL.replace("text", "lower(text)")

VOCAB_DRIFT_SQL = f"""WITH ca AS (
  SELECT tok, count(*) AS c FROM (
    SELECT unnest({_VD_LTOKS}) AS tok FROM documents WHERE doc_id % 2 = 0)
  GROUP BY tok
),
cb AS (
  SELECT tok, count(*) AS c FROM (
    SELECT unnest({_VD_LTOKS}) AS tok FROM documents WHERE doc_id % 2 = 1)
  GROUP BY tok
),
merged AS (
  SELECT tok, coalesce(ca.c, 0) AS ca, coalesce(cb.c, 0) AS cb
  FROM ca FULL OUTER JOIN cb USING (tok)
),
vocab AS (
  SELECT tok, ca, cb FROM merged
  ORDER BY ca + cb DESC, tok ASC LIMIT 1024
),
tot AS (SELECT sum(ca) AS na, sum(cb) AS nb FROM merged)
SELECT tok,
       round((ca + 1.0) / (tot.na + 1025.0), {RD}) AS p_a,
       round((cb + 1.0) / (tot.nb + 1025.0), {RD}) AS p_b,
       round(ln(((ca + 1.0) / (tot.na + 1025.0))
                / ((cb + 1.0) / (tot.nb + 1025.0))), {RD}) AS log_ratio
FROM vocab, tot"""


def q_fingerprint(spark, sf_dir):
    docs = tables.load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        T.fingerprint(F.col("text")).alias("fingerprint"),
        T.text_hash(F.col("text")).alias("text_hash"),
    )


FINGERPRINT_SQL = r"""
SELECT doc_id,
       sha256(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS fingerprint,
       sha256(text) AS text_hash
FROM documents"""


def q_doc_chunks(spark, sf_dir):
    """Overlapping 64-token chunks (16 overlap) per document, exploded to
    one row per chunk with its own hash — the pre-embedding unit for long
    docs. Chunking is scan-stage (no shuffle; plan-tested)."""
    docs = tables.load(spark, sf_dir, "documents")
    ch = docs.withColumn("_toks", T.tokens(F.col("text"))).select(
        "doc_id",
        F.explode(
            T.chunk_spans_of(F.col("_toks"), size=64, overlap=16)
        ).alias("c"),
    )
    return ch.select(
        "doc_id",
        F.col("c.chunk_id").alias("chunk_id"),
        F.length("c.chunk_text").alias("chunk_len"),
        T.text_hash(F.col("c.chunk_text")).alias("chunk_hash"),
    )


# n_chunks: 0 if no tokens, 1 if n <= overlap, else floor((n-o-1)/step)+1;
# chunk i = tokens[i*step : i*step+size] joined by single spaces.
DOC_CHUNKS_SQL = f"""WITH toks AS (
  SELECT doc_id, {TOKS_SQL} AS t FROM documents
),
counted AS (
  SELECT doc_id, t,
         CASE WHEN len(t) = 0 THEN 0
              WHEN len(t) <= 16 THEN 1
              ELSE CAST(floor((len(t) - 16 - 1) / 48.0) AS INT) + 1
         END AS n_chunks
  FROM toks
),
chunks AS (
  SELECT doc_id,
         CAST(unnest(range(0, n_chunks)) AS INT) AS chunk_id, t
  FROM counted WHERE n_chunks > 0
)
SELECT doc_id, chunk_id,
       length(array_to_string(t[chunk_id*48 + 1 : chunk_id*48 + 64], ' '))
         AS chunk_len,
       sha256(array_to_string(t[chunk_id*48 + 1 : chunk_id*48 + 64], ' '))
         AS chunk_hash
FROM chunks"""


def q_doc_split(spark, sf_dir):
    """Deterministic 80/10/10 train/valid/test assignment by hashed
    doc_id (`operators/splits.hash_split`) — stable across runs, engines,
    partitionings; pure scan-stage expression, zero shuffle."""
    docs = tables.load(spark, sf_dir, "documents").select("doc_id")
    return splits.hash_split(
        docs, "doc_id", {"train": 0.8, "valid": 0.1, "test": 0.1}
    )


DOC_SPLIT_SQL = """
SELECT doc_id,
       CASE WHEN b < 8000 THEN 'train'
            WHEN b < 9000 THEN 'valid'
            ELSE 'test' END AS split
FROM (
  SELECT doc_id,
         ('0x' || substr(md5('split_' || CAST(doc_id AS VARCHAR)), 1, 8))
           ::BIGINT % 10000 AS b
  FROM documents)"""


def q_training_corpus(spark, sf_dir):
    """The end-to-end training-data prep pipeline in one plan: exact
    dedup (keep lowest doc_id per sha256) → quality gate (≥10 tokens,
    ≤20% punctuation) → deterministic split → per-split doc/token budget.
    Every stage is scan-side except the dedup aggregation and the final
    rollup — two shuffles total for the whole pipeline."""
    docs = tables.load(spark, sf_dir, "documents")
    keeper = (
        docs.select(T.text_hash(F.col("text")).alias("h"), "doc_id")
        .groupBy("h")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    kept = docs.join(keeper, "doc_id")
    m = T.quality_metrics(F.col("text"))
    filtered = kept.select(
        "doc_id",
        T.token_count(F.col("text")).alias("n_tokens"),
        m["punct_ratio"].alias("_pr"),
    ).filter((F.col("n_tokens") >= 10) & (F.col("_pr") <= 0.2))
    tagged = splits.hash_split(
        filtered, "doc_id", {"train": 0.8, "valid": 0.1, "test": 0.1}
    )
    return tagged.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
    )


_PUNCT_RATIO_SQL = r"""(length(text) - length(regexp_replace(text, '[^\p{L}\p{N}\s]', '', 'g')))
   / CASE WHEN length(text) = 0 THEN 1.0 ELSE CAST(length(text) AS DOUBLE) END"""

TRAINING_CORPUS_SQL = f"""WITH keeper AS (
  SELECT min(doc_id) AS doc_id FROM documents GROUP BY sha256(text)
),
filtered AS (
  SELECT d.doc_id, len({TOKS_SQL}) AS n_tokens
  FROM documents d JOIN keeper USING (doc_id)
  WHERE len({TOKS_SQL}) >= 10 AND {_PUNCT_RATIO_SQL} <= 0.2
),
tagged AS (
  SELECT n_tokens,
         CASE WHEN b < 8000 THEN 'train'
              WHEN b < 9000 THEN 'valid'
              ELSE 'test' END AS split
  FROM (
    SELECT n_tokens,
           ('0x' || substr(md5('split_' || CAST(doc_id AS VARCHAR)), 1, 8))
             ::BIGINT % 10000 AS b
    FROM filtered)
)
SELECT split, count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens
FROM tagged GROUP BY split"""


def q_contamination(spark, sf_dir):
    """Train/eval overlap check: every 11th document's token window 4..15
    plays the held-out benchmark prompt; any doc sharing a word 5-gram
    with it is contaminated. Benchmark grams broadcast; the only shuffle
    is the (doc, bench) pair count."""
    docs = tables.load(spark, sf_dir, "documents")
    # single-file testdata: spread docs BEFORE the gram explode so the
    # hash/probe work uses every core (a non-issue on real multi-file
    # inputs, where the scan itself parallelizes)
    docs = docs.repartition(spark.sparkContext.defaultParallelism)
    bench = docs.filter(F.col("doc_id") % 11 == 0).select(
        F.col("doc_id").alias("bench_id"),
        F.concat_ws(" ", F.slice(T.tokens(F.col("text")), 4, 12)).alias(
            "text"
        ),
    )
    return contamination.ngram_overlap(docs, bench, n=5)


_G5_SQL = """list_distinct(list_transform(
      range(1, greatest(1, len({t}) - 4) + 1),
      i -> array_to_string(({t})[i:i+4], ' ')
    ))"""
_BENCH_TOKS_SQL = TOKS_SQL.replace("text", "btext")

CONTAMINATION_SQL = f"""WITH bench AS (
  SELECT doc_id AS bench_id,
         array_to_string(({TOKS_SQL})[4:15], ' ') AS btext
  FROM documents WHERE doc_id % 11 = 0
),
bgrams AS (
  SELECT bench_id, unnest({_G5_SQL.format(t=_BENCH_TOKS_SQL)}) AS gram
  FROM bench
),
cgrams AS (
  SELECT doc_id, unnest({_G5_SQL.format(t=TOKS_SQL)}) AS gram
  FROM documents
)
SELECT c.doc_id, b.bench_id, count(*) AS n_shared
FROM cgrams c JOIN bgrams b USING (gram)
GROUP BY c.doc_id, b.bench_id"""


def q_winnow_contamination(spark, sf_dir):
    """Same train/eval overlap check via winnowed fingerprints on BOTH
    sides (the MOSS guarantee is symmetric): each side ships ~2/(w+1)
    of its grams — the decontamination shape for a 100 TB corpus against
    a large benchmark suite. k=5, w=4 keeps the 8-token span guarantee."""
    from embeddingsearch_spark.operators import winnow as wn

    docs = tables.load(spark, sf_dir, "documents")
    docs = docs.repartition(spark.sparkContext.defaultParallelism)
    bench = docs.filter(F.col("doc_id") % 11 == 0).select(
        F.col("doc_id").alias("bench_id"),
        F.concat_ws(" ", F.slice(T.tokens(F.col("text")), 4, 12)).alias(
            "text"
        ),
    )
    return wn.winnow_cross_overlap(docs, bench, k=5, w=4)


def _winnow_contamination_sql() -> str:
    from embeddingsearch_spark.suite.dedup import winnow_fp_select

    corpus_src = f"SELECT doc_id, {TOKS_SQL} AS t FROM documents"
    bench_src = (
        f"SELECT doc_id AS bench_id, ({_BENCH_TOKS_SQL}) AS t "
        f"FROM (SELECT doc_id, array_to_string(({TOKS_SQL})[4:15], ' ') "
        f"AS btext FROM documents WHERE doc_id % 11 = 0)"
    )
    return f"""WITH cfp AS (
  SELECT DISTINCT doc_id, fp FROM (
    {winnow_fp_select(corpus_src, "doc_id", 5, 4)}
  )
),
bfp AS (
  SELECT DISTINCT bench_id, fp FROM (
    {winnow_fp_select(bench_src, "bench_id", 5, 4)}
  )
)
SELECT c.doc_id, b.bench_id, count(*) AS n_shared_fp
FROM cfp c JOIN bfp b USING (fp)
GROUP BY c.doc_id, b.bench_id"""


def q_pii_redact(spark, sf_dir):
    """Redaction over a corpus with planted PII (emails on every 7th doc,
    phones on every 5th, IP+SSN on every 9th): returns the redacted text
    plus per-kind counts from the original. Everything is scan-stage
    regexp work — zero shuffles."""
    from embeddingsearch_spark.functions import pii

    docs = tables.load(spark, sf_dir, "documents")
    d = F.col("doc_id")
    planted = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                d % 7 == 0,
                F.concat(
                    F.lit(" contact user"), d.cast("string"),
                    F.lit("@example.com"),
                ),
            ).otherwise(F.lit("")),
            F.when(d % 5 == 0, F.lit(" call 555-867-5309 now")).otherwise(
                F.lit("")
            ),
            F.when(
                d % 9 == 0, F.lit(" from 10.0.0.42 ssn 123-45-6789")
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    counts = pii.pii_counts(F.col("text"))
    return planted.select(
        "doc_id",
        pii.redact_pii(F.col("text")).alias("redacted"),
        *counts.values(),
    )


_PII_RES = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
    "phone": r"\b\d{3}[-.]\d{3}[-.]\d{4}\b",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
}

PII_REDACT_SQL = f"""WITH planted AS (
  SELECT doc_id,
         text
         || CASE WHEN doc_id % 7 = 0
                 THEN ' contact user' || doc_id || '@example.com'
                 ELSE '' END
         || CASE WHEN doc_id % 5 = 0
                 THEN ' call 555-867-5309 now' ELSE '' END
         || CASE WHEN doc_id % 9 = 0
                 THEN ' from 10.0.0.42 ssn 123-45-6789' ELSE '' END
           AS text
  FROM documents
)
SELECT doc_id,
       regexp_replace(regexp_replace(regexp_replace(regexp_replace(
         text,
         '{_PII_RES["email"]}', '<EMAIL>', 'g'),
         '{_PII_RES["ssn"]}', '<SSN>', 'g'),
         '{_PII_RES["phone"]}', '<PHONE>', 'g'),
         '{_PII_RES["ipv4"]}', '<IP>', 'g') AS redacted,
       len(regexp_extract_all(text, '{_PII_RES["email"]}')) AS n_email,
       len(regexp_extract_all(text, '{_PII_RES["ssn"]}')) AS n_ssn,
       len(regexp_extract_all(text, '{_PII_RES["phone"]}')) AS n_phone,
       len(regexp_extract_all(text, '{_PII_RES["ipv4"]}')) AS n_ipv4
FROM planted"""


_MIX_WEIGHTS = {"en": 0.5, "de": 1.0, "fr": 2.5, "zh": 1.2, "es": 0.0}


def q_corpus_mix(spark, sf_dir):
    """Language-weighted corpus mixing: en downsampled, fr oversampled
    2.5x, es dropped — weights are expected copies per row, realized
    deterministically from the id hash (scan-stage explode, no RNG, no
    shuffle)."""
    docs = tables.load(spark, sf_dir, "documents").select(
        "doc_id", "lang"
    )
    return splits.weighted_mix(docs, "doc_id", "lang", _MIX_WEIGHTS)


_MIX_CASE = "CASE lang " + " ".join(
    f"WHEN '{k}' THEN {int(round(w * 10000))}"
    for k, w in _MIX_WEIGHTS.items()
) + " ELSE 0 END"

CORPUS_MIX_SQL = f"""WITH b AS (
  SELECT doc_id, lang,
         CAST(('0x' || substr(md5('mix_' || doc_id), 1, 8)) AS BIGINT)
           % 10000 AS bucket,
         {_MIX_CASE} AS w10k
  FROM documents
),
cop AS (
  SELECT doc_id, lang,
         (w10k // 10000)
         + CASE WHEN bucket < (w10k % 10000) THEN 1 ELSE 0 END AS copies
  FROM b
)
SELECT doc_id, lang, CAST(unnest(range(1, copies + 1)) AS INT) AS copy
FROM cop WHERE copies > 0"""


def q_seq_pack(spark, sf_dir):
    """Greedy sequence packing of the documents table into 256-token
    training examples over 8 deterministic hash shards. The packing scan
    itself is sequential per shard (applyInPandas); the oracle replays it
    with a recursive CTE — packing is pure function of (shard, id order,
    token counts)."""
    docs = tables.load(spark, sf_dir, "documents").select(
        "doc_id", T.token_count(F.col("text")).alias("n_tokens")
    )
    return packing.pack_sequences(docs, budget=256, n_shards=8)


SEQ_PACK_SQL = f"""WITH RECURSIVE base AS (
  SELECT doc_id,
         CAST(len({TOKS_SQL}) AS BIGINT) AS n_tokens,
         CAST(CAST(('0x' || substr(md5('pack_' || doc_id), 1, 8)) AS BIGINT)
              % 8 AS INT) AS shard
  FROM documents
),
seq AS (
  SELECT *, row_number() OVER (PARTITION BY shard ORDER BY doc_id) AS rn
  FROM base
),
r AS (
  SELECT shard, rn, doc_id, n_tokens,
         n_tokens AS acc, CAST(0 AS BIGINT) AS pack, 0 AS pos
  FROM seq WHERE rn = 1
  UNION ALL
  SELECT s.shard, s.rn, s.doc_id, s.n_tokens,
         CASE WHEN r.acc > 0 AND r.acc + s.n_tokens > 256
              THEN s.n_tokens ELSE r.acc + s.n_tokens END,
         CASE WHEN r.acc > 0 AND r.acc + s.n_tokens > 256
              THEN r.pack + 1 ELSE r.pack END,
         CASE WHEN r.acc > 0 AND r.acc + s.n_tokens > 256
              THEN 0 ELSE r.pos + 1 END
  FROM seq s JOIN r ON s.shard = r.shard AND s.rn = r.rn + 1
)
SELECT doc_id, n_tokens, shard,
       shard * 1099511627776 + pack AS pack_id, pos AS pack_pos
FROM r"""


_SPAM = " spam spam spam spam spam spam spam spam"


def q_length_batches(spark, sf_dir):
    """Pad-waste-minimizing batch assignment: log2 length buckets, md5
    shards as the parallelism knob, fixed 32-doc batches cut in
    deterministic id order — one (bucket, shard) shuffle."""
    docs = tables.load(spark, sf_dir, "documents").select(
        "doc_id", T.token_count(F.col("text")).alias("n_tokens")
    )
    return packing.length_bucket_batches(
        docs, batch_size=32, n_shards=4
    )


LENGTH_BATCHES_SQL = f"""WITH base AS (
  SELECT doc_id, CAST(len({TOKS_SQL}) AS BIGINT) AS n_tokens,
         CASE WHEN len({TOKS_SQL}) <= 1 THEN 0
              ELSE CAST(ceil(log2(len({TOKS_SQL}))) AS INT) END AS bucket,
         CAST(CAST(('0x' || substr(md5('lbb_' || doc_id), 1, 8)) AS BIGINT)
              % 4 AS INT) AS shard
  FROM documents
),
rn AS (
  SELECT *, row_number() OVER (PARTITION BY bucket, shard
                               ORDER BY doc_id) - 1 AS r
  FROM base
)
SELECT doc_id, n_tokens, bucket, shard,
       bucket * 1099511627776 + shard * 1048576 + r // 32 AS batch_id,
       CAST(r % 32 AS INT) AS batch_pos
FROM rn"""


_CDC_G, _CDC_D = 4, 16


def q_cdc_chunks(spark, sf_dir):
    """Content-defined chunking (LBFS-style): boundaries where the
    rolling 4-gram hash ≡ 0 mod 16 — chunk hashes survive insertions,
    enabling chunk-level dedup across document revisions. Boundaries are
    independent predicates: pure scan-side, zero shuffle."""
    from embeddingsearch_spark.operators import cdc

    docs = tables.load(spark, sf_dir, "documents")
    return cdc.cdc_chunks(docs, g=_CDC_G, divisor=_CDC_D)


CDC_CHUNKS_SQL = f"""WITH base AS (
  SELECT doc_id, {TOKS_SQL} AS t, len({TOKS_SQL}) AS n FROM documents
),
cand AS (
  SELECT doc_id, t, n,
         CASE WHEN n < {_CDC_G} THEN CAST([] AS INT[])
              ELSE list_transform(list_filter(
                     range({_CDC_G}, greatest(n, {_CDC_G}) + 1),
                     p -> CAST(('0x' || substr(sha256(
                            array_to_string(t[p-{_CDC_G - 1}:p], ' ')),
                            1, 10)) AS BIGINT) % {_CDC_D} = 0),
                   x -> CAST(x AS INT)) END AS cand
  FROM base
),
b AS (
  SELECT doc_id, t,
         CASE WHEN n <= 0 THEN CAST([] AS INT[])
              -- list_distinct does NOT preserve order in DuckDB: sort
              ELSE list_sort(list_distinct(
                     list_append(cand, CAST(n AS INT)))) END
           AS bounds
  FROM cand
),
sp AS (
  SELECT doc_id, t, j AS chunk_id,
         CASE WHEN j = 1 THEN 1 ELSE bounds[j - 1] + 1 END AS start_tok,
         bounds[j] AS end_tok
  FROM b, unnest(range(1, len(bounds) + 1)) AS r(j)
)
SELECT doc_id, CAST(chunk_id AS INT) AS chunk_id,
       CAST(start_tok AS INT) AS start_tok,
       CAST(end_tok - start_tok + 1 AS INT) AS n_tokens,
       substr(sha256(array_to_string(t[start_tok:end_tok], ' ')), 1, 16)
         AS chunk_hash
FROM sp"""


def q_cdc_dedup(spark, sf_dir):
    """Chunk-level dedup profile over CDC chunks: shared chunk hashes
    across docs (revision-level duplication, shift-robust) at
    ~n/divisor shuffle keys per doc."""
    from embeddingsearch_spark.operators import cdc

    docs = tables.load(spark, sf_dir, "documents")
    docs = docs.repartition(spark.sparkContext.defaultParallelism)
    out = cdc.cdc_dedup_profile(docs, g=_CDC_G, divisor=_CDC_D)
    return out.select(
        "doc_id",
        "n_chunks",
        "n_shared_chunks",
        F.round("shared_fraction", RD).alias("shared_fraction"),
    )


CDC_DEDUP_SQL = f"""WITH ch AS ({CDC_CHUNKS_SQL}),
occ AS (SELECT doc_id, chunk_hash, count(*) AS occ
        FROM ch GROUP BY doc_id, chunk_hash),
shared AS (SELECT chunk_hash FROM occ GROUP BY chunk_hash
           HAVING count(*) >= 2),
dup AS (SELECT doc_id, sum(occ) AS n_shared FROM occ
        JOIN shared USING (chunk_hash) GROUP BY doc_id),
tot AS (SELECT doc_id, sum(occ) AS n_chunks FROM occ GROUP BY doc_id)
SELECT t.doc_id, CAST(t.n_chunks AS BIGINT) AS n_chunks,
       CAST(coalesce(d.n_shared, 0) AS BIGINT) AS n_shared_chunks,
       round(CAST(coalesce(d.n_shared, 0) AS DOUBLE) / t.n_chunks,
             {RD}) AS shared_fraction
FROM tot t LEFT JOIN dup d USING (doc_id)"""


def q_batch_pad_stats(spark, sf_dir):
    """Padding-efficiency per length-bucketed batch: fill_frac is the
    fraction of the padded tensor holding real tokens — the metric the
    bucketing exists to maximize."""
    docs = tables.load(spark, sf_dir, "documents").select(
        "doc_id", T.token_count(F.col("text")).alias("n_tokens")
    )
    b = packing.length_bucket_batches(docs, batch_size=32, n_shards=4)
    out = packing.batch_pad_stats(b)
    return out.select(
        "bucket",
        "batch_id",
        "n_docs",
        "max_tokens",
        "sum_tokens",
        F.round("fill_frac", RD).alias("fill_frac"),
    )


BATCH_PAD_STATS_SQL = f"""WITH lb AS ({LENGTH_BATCHES_SQL})
SELECT bucket, batch_id, count(*) AS n_docs,
       max(n_tokens) AS max_tokens,
       CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
       round(CAST(sum(n_tokens) AS DOUBLE)
             / (count(*) * max(n_tokens)), {RD}) AS fill_frac
FROM lb GROUP BY bucket, batch_id"""


def q_repetition_filter(spark, sf_dir):
    """Gopher-style repetition metrics over a corpus with planted
    repetition (every 8th doc gets a spam 2-gram run, every 6th gets its
    whole body duplicated as a second line). Zero-shuffle mapInPandas —
    each doc's metrics are a pure function of its own text."""
    docs = tables.load(spark, sf_dir, "documents")
    docs = docs.repartition(spark.sparkContext.defaultParallelism)
    d = F.col("doc_id")
    b = F.concat(
        F.col("text"),
        F.when(d % 8 == 0, F.lit(_SPAM)).otherwise(F.lit("")),
    )
    planted = docs.select(
        "doc_id",
        F.concat(
            b,
            F.when(d % 6 == 0, F.concat(F.lit("\n"), b)).otherwise(
                F.lit("")
            ),
        ).alias("text"),
    )
    prof = repetition.repetition_profile(planted)
    return prof.select(
        "doc_id",
        "n_tokens",
        F.round("dup_line_frac", RD).alias("dup_line_frac"),
        F.round("top2_frac", RD).alias("top2_frac"),
        F.round("dup5_frac", RD).alias("dup5_frac"),
        "keep",
    )


_RF_T2 = "CASE WHEN b.n_tokens >= 2 THEN coalesce(mx, 0) * 2.0 / b.n_tokens ELSE 0.0 END"
_RF_D5 = "CASE WHEN b.n_tokens >= 5 THEN coalesce(dup, 0) * 5.0 / b.n_tokens ELSE 0.0 END"

REPETITION_FILTER_SQL = f"""WITH planted AS (
  SELECT doc_id,
         (text || s)
         || CASE WHEN doc_id % 6 = 0 THEN chr(10) || (text || s)
                 ELSE '' END AS text
  FROM (SELECT doc_id, text,
               CASE WHEN doc_id % 8 = 0 THEN '{_SPAM}' ELSE '' END AS s
        FROM documents)
),
toks AS (
  SELECT doc_id, {TOKS_SQL} AS t, string_split(text, chr(10)) AS lines
  FROM planted
),
base AS (
  SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tokens,
         CASE WHEN len(lines) = 0 THEN 0.0
              ELSE 1.0 - CAST(len(list_distinct(lines)) AS DOUBLE)
                         / len(lines) END AS dlf,
         t
  FROM toks
),
g2 AS (
  SELECT doc_id, unnest(list_transform(
    range(1, greatest(0, len(t) - 1) + 1),
    i -> array_to_string(t[i:i+1], ' '))) AS g
  FROM base
),
g2c AS (SELECT doc_id, g, count(*) AS c FROM g2 GROUP BY 1, 2),
m2 AS (SELECT doc_id, max(c) AS mx FROM g2c GROUP BY 1),
g5 AS (
  SELECT doc_id, unnest(list_transform(
    range(1, greatest(0, len(t) - 4) + 1),
    i -> array_to_string(t[i:i+4], ' '))) AS g
  FROM base
),
g5c AS (SELECT doc_id, g, count(*) AS c FROM g5 GROUP BY 1, 2),
d5 AS (
  SELECT doc_id, sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup
  FROM g5c GROUP BY 1
)
SELECT b.doc_id, b.n_tokens,
       round(b.dlf, {RD}) AS dup_line_frac,
       round({_RF_T2}, {RD}) AS top2_frac,
       round({_RF_D5}, {RD}) AS dup5_frac,
       (b.dlf <= 0.3 AND {_RF_T2} <= 0.2 AND {_RF_D5} <= 0.3) AS keep
FROM base b
LEFT JOIN m2 USING (doc_id)
LEFT JOIN d5 USING (doc_id)"""


def q_epoch_shuffle(spark, sf_dir):
    """Epoch-1 deterministic shuffle of the documents table into 8
    shards: (shard, pos) from the id hash — one exchange plus per-shard
    sort, no orderBy(rand()) nondeterminism."""
    docs = tables.load(spark, sf_dir, "documents").select("doc_id")
    return splits.epoch_shuffle(docs, "doc_id", epoch=1, n_shards=8)


EPOCH_SHUFFLE_SQL = """WITH h AS (
  SELECT doc_id, md5('shuffle_1_' || doc_id) AS hh FROM documents
),
s AS (
  SELECT doc_id, hh,
         CAST(CAST(('0x' || substr(hh, 1, 8)) AS BIGINT) % 8 AS INT)
           AS shard
  FROM h
)
SELECT doc_id, shard,
       CAST(row_number() OVER (
         PARTITION BY shard ORDER BY hh, doc_id) AS INT) AS pos
FROM s"""


def q_corpus_stats(spark, sf_dir):
    """Per-source corpus profile via `sketches.group_profile` (exact
    variant — the oracle twin; the sketched HLL++/KLL variant is the
    100 TB path with the same schema): doc count, distinct languages,
    median/p95/total tokens."""
    from embeddingsearch_spark.operators.sketches import group_profile

    docs = tables.load(spark, sf_dir, "documents").select(
        "source",
        "lang",
        # double so sum/median/round agree with the oracle's DOUBLE results
        T.token_count(F.col("text")).cast("double").alias("n_tokens"),
    )
    return group_profile(
        docs, "source", value_col="n_tokens", distinct_col="lang", exact=True
    )


CORPUS_STATS_SQL = f"""
SELECT source, count(*) AS n_rows,
       count(DISTINCT lang) AS n_distinct,
       round(quantile_cont(len({TOKS_SQL}), 0.5), {RD}) AS median_value,
       round(quantile_cont(len({TOKS_SQL}), 0.95), {RD}) AS p95_value,
       round(CAST(sum(len({TOKS_SQL})) AS DOUBLE), {RD}) AS sum_value
FROM documents GROUP BY source"""


def q_token_histogram(spark, sf_dir):
    """Token-length histogram in log2 buckets — the partial-aggregable
    (map-side-combinable) corpus profile: the shuffle carries one row per
    (partition, bucket), never per doc, so it costs the same at 100 TB as
    the scan itself. floor(log2(n+1)) is exact in doubles at every bucket
    boundary (powers of two)."""
    docs = tables.load(spark, sf_dir, "documents").select(
        T.token_count(F.col("text")).alias("n_tokens")
    )
    return (
        docs.groupBy(
            F.floor(F.log2(F.col("n_tokens") + 1)).cast("int").alias("bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("n_tokens").alias("min_tokens"),
            F.max("n_tokens").alias("max_tokens"),
        )
    )


TOKEN_HISTOGRAM_SQL = f"""
SELECT CAST(floor(log2(len({TOKS_SQL}) + 1)) AS INT) AS bucket,
       count(*) AS n_docs,
       min(len({TOKS_SQL})) AS min_tokens,
       max(len({TOKS_SQL})) AS max_tokens
FROM documents GROUP BY 1"""


_CMS_D, _CMS_W = 4, 8192


def q_token_heavy_hitters(spark, sf_dir):
    """Count-Min-sketched token frequencies (`sketches.cms_build` /
    `cms_estimate`): the fixed-memory path for frequency queries over
    vocabularies too large to count exactly — the sketch is depth x width
    counters no matter the corpus, broadcastable and mergeable across
    shards by addition. Candidates here are the distinct tokens of the
    first 5 docs; estimates are CMS upper bounds, reproduced exactly by
    the oracle (sha256-window buckets, the MinHash portability trick)."""
    from embeddingsearch_spark.operators import sketches as sk

    docs = tables.load(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(T.tokens(F.lower(F.col("text")))).alias("tok")
    )
    cms = sk.cms_build(
        toks, "tok", depth=_CMS_D, width=_CMS_W, hash_fn="sha256"
    )
    cand = (
        docs.filter(F.col("doc_id") < 5)
        .select(F.explode(T.tokens(F.lower(F.col("text")))).alias("tok"))
        .distinct()
    )
    return sk.cms_estimate(
        cms, cand, "tok", depth=_CMS_D, width=_CMS_W, hash_fn="sha256"
    )


_CMS_BUCKET = (
    "(('0x' || substr(sha256({s} || ':' || tok), 1, 15))::BIGINT % {w})"
)
TOKEN_HEAVY_HITTERS_SQL = f"""WITH toks AS (
  SELECT unnest({{LT}}) AS tok FROM documents
),
cms AS (
  SELECT seed, bucket, CAST(count(*) AS BIGINT) AS c FROM (
    {" UNION ALL ".join(
        f"SELECT {s} AS seed, {_CMS_BUCKET.format(s=s, w=_CMS_W)} AS bucket"
        " FROM toks"
        for s in range(_CMS_D)
    )}
  ) GROUP BY seed, bucket
),
cand AS (
  SELECT DISTINCT unnest({{LT}}) AS tok FROM documents WHERE doc_id < 5
),
probes AS (
  {" UNION ALL ".join(
      f"SELECT tok, {s} AS seed, {_CMS_BUCKET.format(s=s, w=_CMS_W)} AS bucket"
      " FROM cand"
      for s in range(_CMS_D)
  )}
)
SELECT p.tok, min(coalesce(c.c, 0)) AS est_count
FROM probes p LEFT JOIN cms c USING (seed, bucket)
GROUP BY p.tok"""
TOKEN_HEAVY_HITTERS_SQL = TOKEN_HEAVY_HITTERS_SQL.replace(
    "{LT}", TOKS_SQL.replace("text", "lower(text)")
)


def q_phrase_pmi(spark, sf_dir):
    """Bigram PMI phrase detection (`operators/phrases.phrase_scores`,
    word2phrase-style): adjacent pairs co-occurring beyond unigram
    expectation, the pre-tokenizer phrase-merge signal. Two scan-side
    explodes + counts; text never shuffles."""
    from embeddingsearch_spark.operators import phrases

    docs = tables.load(spark, sf_dir, "documents")
    return phrases.phrase_scores(docs, "text", min_count=5)


PHRASE_PMI_SQL = """WITH t AS (
  SELECT {LT} AS t FROM documents
),
uni AS (
  SELECT w, count(*) AS n_w
  FROM (SELECT unnest(t) AS w FROM t) GROUP BY w
),
bi AS (
  SELECT t[i] AS w1, t[i + 1] AS w2, count(*) AS n_pair
  FROM t, unnest(range(1, len(t))) AS r(i)
  WHERE len(t) >= 2
  GROUP BY 1, 2 HAVING count(*) >= 5
),
tot AS (
  SELECT CAST(sum(len(t)) AS BIGINT) AS T,
         CAST(sum(greatest(len(t) - 1, 0)) AS BIGINT) AS B
  FROM t
)
SELECT b.w1, b.w2, b.n_pair, u1.n_w AS n_w1, u2.n_w AS n_w2,
       round(ln((CAST(b.n_pair AS DOUBLE) / tot.B)
             / ((CAST(u1.n_w AS DOUBLE) / tot.T)
                * (CAST(u2.n_w AS DOUBLE) / tot.T))), {RD}) + 0.0 AS pmi
FROM bi b
JOIN uni u1 ON u1.w = b.w1
JOIN uni u2 ON u2.w = b.w2
CROSS JOIN tot"""
PHRASE_PMI_SQL = PHRASE_PMI_SQL.replace(
    "{LT}", TOKS_SQL.replace("text", "lower(text)")
).replace("{RD}", str(RD))


def q_eval_holdout(spark, sf_dir):
    """Exactly-N-per-language holdout sample
    (`splits.stratified_fixed_n`): 20 docs per lang in reproducible
    md5 order — the deterministic eval-set constructor."""
    docs = tables.load(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source"
    )
    return splits.stratified_fixed_n(docs, "doc_id", "lang", 20)


EVAL_HOLDOUT_SQL = """
SELECT doc_id, lang, source FROM (
  SELECT doc_id, lang, source,
         row_number() OVER (
           PARTITION BY lang
           ORDER BY md5('sample' || '|' || CAST(doc_id AS VARCHAR)) ASC,
                    doc_id ASC) AS rn
  FROM documents
) WHERE rn <= 20"""


def q_tfidf_topk(spark, sf_dir):
    """Top-3 terms per document by smoothed TF-IDF (operators/tfidf.py).
    Ties broken by token ascending — a total order both engines agree on."""
    from embeddingsearch_spark.operators import tfidf

    docs = tables.load(spark, sf_dir, "documents")
    docs = docs.repartition(spark.sparkContext.defaultParallelism)
    out = tfidf.tfidf_top_terms(docs, k=3)
    return out.select(
        "doc_id", "term", "rank", "tf", "df", F.round("tfidf", RD).alias("tfidf")
    )


_LOWER_TOKS_SQL = TOKS_SQL.replace("text", "lower(text)")

TFIDF_TOPK_SQL = f"""WITH toks AS (
  SELECT doc_id, unnest({_LOWER_TOKS_SQL}) AS token FROM documents
),
tf AS (SELECT doc_id, token, count(*) AS tf FROM toks GROUP BY 1, 2),
df AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
n AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.token, tf.tf, df.df,
         tf.tf * ln((n.n_docs + 1.0) / (df.df + 1.0)) AS score,
         row_number() OVER (
           PARTITION BY tf.doc_id
           ORDER BY tf.tf * ln((n.n_docs + 1.0) / (df.df + 1.0)) DESC,
                    tf.token ASC) AS rank
  FROM tf JOIN df USING (token), n
)
SELECT doc_id, token AS term, CAST(rank AS INT) AS rank, tf, df,
       round(score, {RD}) AS tfidf
FROM scored WHERE rank <= 3"""


def q_vocab_df(spark, sf_dir):
    """Top-100 vocabulary terms by document frequency (df desc, token asc)
    with corpus frequency — the stopword/boilerplate-mining view."""
    from embeddingsearch_spark.operators import tfidf

    docs = tables.load(spark, sf_dir, "documents")
    docs = docs.repartition(spark.sparkContext.defaultParallelism)
    return (
        tfidf.vocabulary(docs)
        .orderBy(F.col("df").desc(), F.col("token").asc())
        .limit(100)
    )


VOCAB_DF_SQL = f"""WITH toks AS (
  SELECT doc_id, unnest({_LOWER_TOKS_SQL}) AS token FROM documents
),
tf AS (SELECT doc_id, token, count(*) AS tf FROM toks GROUP BY 1, 2)
SELECT token, count(*) AS df, CAST(sum(tf) AS BIGINT) AS cf
FROM tf GROUP BY token
ORDER BY df DESC, token ASC LIMIT 100"""


def q_bpe_pair_merges(spark, sf_dir):
    """BPE training statistics (`operators/bpe.py`, Sennrich et al.
    2016): word histogram (the only corpus-sized pass) → char+end-marker
    symbolization of the VOCAB → adjacent-pair counts → top-40 merge
    candidates with deterministic (count desc, pair asc) ranking."""
    from embeddingsearch_spark.operators import bpe

    docs = tables.load(spark, sf_dir, "documents")
    docs = docs.repartition(spark.sparkContext.defaultParallelism)
    return bpe.bpe_top_merges(bpe.bpe_pair_counts(docs), n_merges=40)


BPE_PAIR_MERGES_SQL = f"""WITH toks AS (
  SELECT unnest({_LOWER_TOKS_SQL}) AS word FROM documents
),
wc AS (SELECT word, count(*) AS n FROM toks GROUP BY word),
syms AS (
  SELECT n, list_append(string_split(word, ''), '</w>') AS s FROM wc
),
pairs AS (
  SELECT s[i] AS a, s[i + 1] AS b, n
  FROM syms, unnest(range(1, len(s))) AS r(i)
),
pc AS (SELECT a, b, CAST(sum(n) AS BIGINT) AS n_pairs FROM pairs GROUP BY a, b)
SELECT a, b, n_pairs, CAST(row_number() OVER (
         ORDER BY n_pairs DESC, a ASC, b ASC) AS INT) AS rank
FROM pc
QUALIFY rank <= 40"""


def q_bpe_encode(spark, sf_dir):
    """Tokenizer loop closed: train the ranked merge table on the corpus
    (bpe_pair_merges), then ENCODE every document with it — distinct
    words run the merge loop once (vocab-sized Python), the encoded
    vocab broadcasts back onto per-doc word counts. Output per doc:
    whitespace words vs BPE pieces under 40 merges."""
    from embeddingsearch_spark.operators import bpe

    docs = tables.load(spark, sf_dir, "documents")
    docs = docs.repartition(spark.sparkContext.defaultParallelism)
    merges = bpe.bpe_top_merges(bpe.bpe_pair_counts(docs), n_merges=40)
    return bpe.bpe_encode_docs(docs, merges)


# Apply = iterate: find the min-rank merge whose delimited pair occurs,
# replace all leftmost-non-overlapping occurrences (DuckDB replace ==
# Python str.replace), repeat until none present. The recursive CTE
# carries one step per row; fin takes each word's last step.
BPE_ENCODE_SQL = f"""WITH RECURSIVE m AS (
  {BPE_PAIR_MERGES_SQL.replace("SELECT a, b, n_pairs,", "SELECT a, b,")}
),
words AS (
  SELECT DISTINCT unnest({_LOWER_TOKS_SQL}) AS word FROM documents
),
init AS (
  SELECT word,
         ' ' || array_to_string(
           list_append(string_split(word, ''), '</w>'), ' ') || ' ' AS s
  FROM words
),
r AS (
  SELECT word, s, 0 AS step FROM init
  UNION ALL
  SELECT t.word,
         replace(t.s, ' ' || bm.a || ' ' || bm.b || ' ',
                 ' ' || bm.a || bm.b || ' ') AS s,
         t.step + 1
  FROM (
    SELECT word, s, step,
           (SELECT min(rank) FROM m
            WHERE contains(s, ' ' || m.a || ' ' || m.b || ' ')) AS best
    FROM r WHERE step < 64
  ) t JOIN m bm ON bm.rank = t.best
),
fin AS (
  SELECT word, s FROM (
    SELECT word, s,
           row_number() OVER (PARTITION BY word ORDER BY step DESC) AS rn
    FROM r) WHERE rn = 1
),
enc AS (
  SELECT word, len(string_split(trim(s), ' ')) AS n_pieces FROM fin
),
dwc AS (
  SELECT doc_id, word, count(*) AS c FROM (
    SELECT doc_id, unnest({_LOWER_TOKS_SQL}) AS word FROM documents
  ) GROUP BY doc_id, word
)
SELECT d.doc_id, CAST(sum(d.c) AS BIGINT) AS n_words,
       CAST(sum(d.c * e.n_pieces) AS BIGINT) AS n_bpe_pieces
FROM dwc d JOIN enc e USING (word)
GROUP BY d.doc_id"""


def q_dsir_select(spark, sf_dir):
    """DSIR importance resampling (`operators/dsir.py`, Xie et al.
    2023): select the 100 raw docs whose hashed-ngram distribution best
    matches the English subset, via Gumbel-top-k over Laplace-smoothed
    bucket-model log ratios. Every stage (sha256 bucket hash, seeded
    Gumbel noise) is engine-independent, so the oracle replays the full
    pipeline."""
    from embeddingsearch_spark.operators import dsir

    docs = tables.load(spark, sf_dir, "documents")
    docs = docs.repartition(spark.sparkContext.defaultParallelism)
    target = docs.filter(F.col("lang") == "en")
    return dsir.dsir_select(docs, target, n=100, buckets=4096)


_DSIR_H60 = "CAST(('0x' || substr(sha256({e}), 1, 15)) AS BIGINT)"

DSIR_SELECT_SQL = f"""WITH raw_toks AS (
  SELECT doc_id, {_LOWER_TOKS_SQL} AS t FROM documents
),
grams AS (
  SELECT doc_id, unnest(list_concat(
    t,
    CASE WHEN len(t) >= 2 THEN list_transform(
      range(1, len(t)), i -> t[i] || ' ' || t[i + 1]
    ) ELSE [] END)) AS gram
  FROM raw_toks
),
feats AS (
  SELECT doc_id, {_DSIR_H60.format(e='gram')} % 4096 AS bucket,
         count(*) AS c
  FROM grams GROUP BY 1, 2
),
t_feats AS (
  SELECT f.bucket, sum(f.c) AS cb FROM feats f
  JOIN documents d USING (doc_id) WHERE d.lang = 'en' GROUP BY 1
),
r_feats AS (SELECT bucket, sum(c) AS cb FROM feats GROUP BY 1),
t_tot AS (SELECT sum(cb) AS tot FROM t_feats),
r_tot AS (SELECT sum(cb) AS tot FROM r_feats),
terms AS (
  SELECT f.doc_id,
         f.c * (
           ln((coalesce(tf.cb, 0) + 1.0) / (tt.tot + 4096.0))
           - ln((rf.cb + 1.0) / (rt.tot + 4096.0))
         ) AS term
  FROM feats f
  LEFT JOIN t_feats tf USING (bucket)
  JOIN r_feats rf USING (bucket)
  CROSS JOIN t_tot tt CROSS JOIN r_tot rt
),
lw AS (SELECT doc_id, sum(term) AS log_w FROM terms GROUP BY doc_id),
scored AS (
  SELECT doc_id, log_w,
         round(log_w + (
           -ln(-ln((({_DSIR_H60.format(e="CAST(doc_id AS VARCHAR) || '|42'")})
                    + 0.5) / 1152921504606846976.0))
         ), {RD}) AS score
  FROM lw
)
SELECT doc_id, round(log_w, {RD}) AS log_w,
       CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS INT)
         AS rank
FROM scored
QUALIFY rank <= 100"""


def q_quality_classifier(spark, sf_dir):
    """Fasttext-style linear quality classifier: logistic score over the
    engineered quality features, entirely scan-stage (operators/classifier).
    The label compares the logit to 0 so it never rides a float boundary."""
    from embeddingsearch_spark.operators import classifier

    docs = tables.load(spark, sf_dir, "documents")
    out = classifier.classify_quality(docs)
    return out.select(
        "doc_id",
        F.round("quality_logit", RD).alias("quality_logit"),
        F.round("quality_prob", RD).alias("quality_prob"),
        "is_high_quality",
    )


_PUNCT_R = (
    r"(length(text) - length(regexp_replace(text, '[^\p{L}\p{N}\s]', '', 'g')))"
    r" / CASE WHEN length(text) = 0 THEN 1.0 ELSE CAST(length(text) AS DOUBLE) END"
)
_DIGIT_R = (
    r"(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')))"
    r" / CASE WHEN length(text) = 0 THEN 1.0 ELSE CAST(length(text) AS DOUBLE) END"
)
_SPACE_LEN = r"(length(text) - length(regexp_replace(text, '\s', '', 'g')))"
_SW_R = (
    "CASE WHEN len({T}) = 0 THEN 0.0 ELSE "
    "CAST(len(list_filter({LT}, t -> list_contains([{SW}], t))) AS DOUBLE)"
    " / len({T}) END"
)
_ATL = (
    "CASE WHEN len({T}) = 0 THEN 0.0 ELSE "
    f"(CAST(length(text) AS DOUBLE) - {_SPACE_LEN}) / len({{T}}) END"
)

QUALITY_CLASSIFIER_SQL = f"""WITH z AS (
  SELECT doc_id,
         -4.5 + 0.8 * ln(1 + len({{T}}))
              + 12.0 * ({_SW_R})
              - 8.0 * ({_PUNCT_R})
              - 6.0 * ({_DIGIT_R})
              + 0.15 * ({_ATL}) AS logit
  FROM documents
)
SELECT doc_id,
       round(logit, {RD}) AS quality_logit,
       round(1.0 / (1.0 + exp(-logit)), {RD}) AS quality_prob,
       logit >= 0 AS is_high_quality
FROM z"""
QUALITY_CLASSIFIER_SQL = (
    QUALITY_CLASSIFIER_SQL.replace("{LT}", TOKS_SQL.replace("text", "lower(text)"))
    .replace("{T}", TOKS_SQL)
    .replace("{SW}", ", ".join(f"'{w}'" for w in _SW_LIST))
)


_MIX_ALPHA = 0.3


def q_mix_temperature(spark, sf_dir):
    """Temperature-scaled mixture weights per source (p ∝ n^0.3, the
    mT5-style low-resource boost): weight and expected upsample factor
    per corpus source."""
    from embeddingsearch_spark.operators import splits

    docs = tables.load(spark, sf_dir, "documents").select("doc_id", "source")
    out = splits.mixture_weights_temperature(docs, "source", alpha=_MIX_ALPHA)
    return out.select(
        "source",
        "n_docs",
        F.round("weight", RD).alias("weight"),
        F.round("upsample_factor", RD).alias("upsample_factor"),
    )


MIX_TEMPERATURE_SQL = f"""WITH c AS (
  SELECT source, count(*) AS n_docs FROM documents GROUP BY source
),
t AS (SELECT sum(pow(n_docs, {_MIX_ALPHA})) AS z, sum(n_docs) AS n FROM c)
SELECT c.source, CAST(c.n_docs AS BIGINT) AS n_docs,
       round(pow(c.n_docs, {_MIX_ALPHA}) / t.z, {RD}) AS weight,
       round(pow(c.n_docs, {_MIX_ALPHA}) / t.z * t.n / c.n_docs,
             {RD}) AS upsample_factor
FROM c CROSS JOIN t"""


def q_text_normalize(spark, sf_dir):
    """CCNet/C4-style web-text cleanup over docs planted with CRLF,
    NBSP/ideographic spaces, zero-width chars, control chars, and blank-
    line runs — the normalization pass that runs BEFORE hashing so
    encoding noise can't defeat exact dedup. Pure scan-stage regexp
    chain (zero shuffle)."""
    docs = tables.load(spark, sf_dir, "documents")
    messy = F.concat(
        F.lit("\u00a0  "),
        F.col("text"),
        F.lit("\x07\u200b\r\n\n\n\nend\u3000here\t tail  "),
    )
    staged = docs.select("doc_id", messy.alias("_messy"))
    return staged.select(
        "doc_id",
        F.length("_messy").alias("n_chars_before"),
        T.clean_web_text(F.col("_messy")).alias("text"),
    ).withColumn("n_chars_after", F.length("text"))


TEXT_NORMALIZE_SQL = r"""WITH planted AS (
  SELECT doc_id,
         chr(160) || '  ' || text || chr(7) || chr(8203) || chr(13)
         || repeat(chr(10), 4) || 'end' || chr(12288) || 'here'
         || chr(9) || ' tail  ' AS messy
  FROM documents
),
cleaned AS (
  SELECT doc_id, length(messy) AS n_chars_before,
         trim(
          regexp_replace(
           regexp_replace(
            regexp_replace(
             regexp_replace(
              regexp_replace(
               regexp_replace(
                regexp_replace(messy, '\r\n?', chr(10), 'g'),
                '[\x{200B}\x{200C}\x{200D}\x{FEFF}]', '', 'g'),
               '[\t\x{00A0}\x{1680}\x{2000}-\x{200A}\x{202F}\x{205F}\x{3000}]',
               ' ', 'g'),
              '[\x{0000}-\x{0009}\x{000B}-\x{001F}\x{007F}]', '', 'g'),
             ' {2,}', ' ', 'g'),
            ' ?\n ?', chr(10), 'g'),
           '\n{3,}', chr(10) || chr(10), 'g')
         ) AS text
  FROM planted
)
SELECT doc_id, n_chars_before, text, length(text) AS n_chars_after
FROM cleaned"""


def q_html_extract(spark, sf_dir):
    """Regex HTML → text over docs wrapped in a planted page shell
    (style block, heading, comment, entity-bearing footer): the raw-
    crawl extraction step before every other text operator. Scan-stage
    regexp chain, zero shuffle."""
    docs = tables.load(spark, sf_dir, "documents")
    page = F.concat(
        F.lit("<html><body><h1>Doc "),
        F.col("doc_id").cast("string"),
        F.lit("</h1><style>b{}</style><p>"),
        F.col("text"),
        F.lit("</p><!-- c --><div>footer&nbsp;&amp;&nbsp;note</div>"
              "</body></html>"),
    )
    staged = docs.select("doc_id", page.alias("_html"))
    return staged.select(
        "doc_id", T.html_to_text(F.col("_html")).alias("text")
    ).withColumn("n_chars", F.length("text"))


def q_web_curation(spark, sf_dir):
    """End-to-end raw-crawl curation in ONE plan: HTML extraction →
    exact dedup on the EXTRACTED text → word-count gate. Every 9th doc
    is a re-render of its predecessor's content (different
    markup shell) — extraction must normalize the markup away so the
    dedup stage catches the re-render as an exact duplicate; keep =
    canonical copy passing the gate."""
    docs = tables.load(spark, sf_dir, "documents")
    d = F.col("doc_id")
    # source the re-render from doc_id - 1: d-1 is never itself a
    # multiple of 9, so its page renders its OWN text and the pair
    # (d-1, d) is a true extracted-text duplicate for every 9th doc
    dup_src = docs.select(
        (F.col("doc_id") + 1).alias("doc_id"),
        F.col("text").alias("_dup_text"),
    )
    base = docs.join(dup_src, "doc_id", "left_outer")
    content = F.when(
        (d % 9 == 0) & F.col("_dup_text").isNotNull(), F.col("_dup_text")
    ).otherwise(F.col("text"))
    shell_attr = F.when(d % 2 == 0, F.lit(' class="main"')).otherwise(
        F.lit(' id="body"')
    )
    page = F.concat(
        F.lit("<html><body><div"), shell_attr, F.lit("><p>"),
        content,
        F.lit("</p></div><script>track()</script></body></html>"),
    )
    extracted = base.select(
        "doc_id", T.html_to_text(page).alias("text")
    )
    from embeddingsearch_spark.operators import dedup as dd_ops

    deduped = dd_ops.exact_duplicates(extracted, "doc_id", "text")
    n_words = T.token_count(F.col("text"))
    gated = extracted.select(
        "doc_id",
        F.length("text").alias("n_chars"),
        (n_words >= 10).alias("ok_words"),
    )
    j = gated.join(
        deduped.select("doc_id", "canonical_id", "is_duplicate"), "doc_id"
    )
    return j.select(
        "doc_id",
        "n_chars",
        "canonical_id",
        "is_duplicate",
        "ok_words",
        ((F.col("doc_id") == F.col("canonical_id")) & F.col("ok_words"))
        .alias("keep"),
    )


def _html_strip_sql(expr: str) -> str:
    """The DuckDB mirror of functions.text.html_to_text (tag strip +
    entity decode + clean_web_text), composed programmatically so the
    nesting stays readable."""
    t = f"regexp_replace({expr}, '(?is)<script\\b[^>]*>.*?</script\\s*>', ' ', 'g')"
    t = f"regexp_replace({t}, '(?is)<style\\b[^>]*>.*?</style\\s*>', ' ', 'g')"
    t = f"regexp_replace({t}, '(?s)<!--.*?-->', ' ', 'g')"
    t = (f"regexp_replace({t}, "
         f"'(?i)</?(p|div|li|tr|h[1-6])\\b[^>]*>|<br\\s*/?>', chr(10), 'g')")
    t = f"regexp_replace({t}, '(?s)<[^>]+>', ' ', 'g')"
    for ent, rep in (
        ("&nbsp;", "' '"),
        ("&lt;", "'<'"),
        ("&gt;", "'>'"),
        ("&quot;", "'\"'"),
        ("&#39;", "chr(39)"),
        ("&amp;", "'&'"),
    ):
        t = f"replace({t}, '{ent}', {rep})"
    # clean_web_text chain
    t = f"regexp_replace({t}, '\\r\\n?', chr(10), 'g')"
    t = f"regexp_replace({t}, '[\\x{{200B}}\\x{{200C}}\\x{{200D}}\\x{{FEFF}}]', '', 'g')"
    t = (f"regexp_replace({t}, '[\\t\\x{{00A0}}\\x{{1680}}"
         f"\\x{{2000}}-\\x{{200A}}\\x{{202F}}\\x{{205F}}\\x{{3000}}]', ' ', 'g')")
    t = (f"regexp_replace({t}, "
         f"'[\\x{{0000}}-\\x{{0009}}\\x{{000B}}-\\x{{001F}}\\x{{007F}}]', '', 'g')")
    t = f"regexp_replace({t}, ' {{2,}}', ' ', 'g')"
    t = f"regexp_replace({t}, ' ?\\n ?', chr(10), 'g')"
    t = f"regexp_replace({t}, '\\n{{3,}}', chr(10) || chr(10), 'g')"
    return f"trim({t})"


WEB_CURATION_SQL = f"""WITH base AS (
  SELECT d.doc_id,
         CASE WHEN d.doc_id % 9 = 0 AND j.text IS NOT NULL
              THEN j.text ELSE d.text END AS content,
         CASE WHEN d.doc_id % 2 = 0 THEN ' class="main"'
              ELSE ' id="body"' END AS attr
  FROM documents d LEFT JOIN documents j ON j.doc_id = d.doc_id - 1
),
pages AS (
  SELECT doc_id,
         '<html><body><div' || attr || '><p>' || content
         || '</p></div><script>track()</script></body></html>' AS html
  FROM base
),
extracted AS (
  SELECT doc_id, {_html_strip_sql('html')} AS text FROM pages
),
fp AS (
  SELECT doc_id, text,
         sha256(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS f
  FROM extracted
),
g AS (SELECT f, min(doc_id) AS canonical_id, count(*) AS n
      FROM fp GROUP BY f)
SELECT fp.doc_id,
       length(fp.text) AS n_chars,
       g.canonical_id,
       g.n > 1 AS is_duplicate,
       len({TOKS_SQL.replace('text', 'fp.text')}) >= 10 AS ok_words,
       (fp.doc_id = g.canonical_id
        AND len({TOKS_SQL.replace('text', 'fp.text')}) >= 10) AS keep
FROM fp JOIN g USING (f)"""


HTML_EXTRACT_SQL = f"""WITH planted AS (
  SELECT doc_id,
         '<html><body><h1>Doc ' || CAST(doc_id AS VARCHAR)
         || '</h1><style>b{{}}</style><p>' || text
         || '</p><!-- c --><div>footer&nbsp;&amp;&nbsp;note</div>'
         || '</body></html>' AS html
  FROM planted_src
),
cleaned AS (
  SELECT doc_id, {_html_strip_sql('html')} AS text FROM planted
)
SELECT doc_id, text, length(text) AS n_chars FROM cleaned""".replace(
    "planted_src", "documents"
)


def q_fix_mojibake(spark, sf_dir):
    """Mojibake repair over docs planted with the classic
    UTF-8-read-as-cp1252 damage (cafÃ©, donâ€™t, â€œquotesâ€\x9d):
    table-driven chained replace, scan-stage, zero shuffle. Damaged
    suffix and oracle pairs both derive from MOJIBAKE_PAIRS — one
    source of truth."""
    from embeddingsearch_spark.functions.text import MOJIBAKE_PAIRS

    damaged = {f: m for m, f in MOJIBAKE_PAIRS}
    suffix = (
        " caf" + damaged["\u00e9"] + " don" + damaged["\u2019"]
        + "t " + damaged["\u201c"] + "quoted" + damaged["\u201d"]
        + " " + damaged["\u2026"]
    )
    docs = tables.load(spark, sf_dir, "documents")
    staged = docs.select(
        "doc_id", F.concat(F.col("text"), F.lit(suffix)).alias("_dmg")
    )
    return staged.select(
        "doc_id",
        F.length("_dmg").alias("n_chars_before"),
        T.fix_mojibake(F.col("_dmg")).alias("text"),
    ).withColumn("n_chars_after", F.length("text"))


def _sql_chr(sv: str) -> str:
    return " || ".join(f"chr({ord(c)})" for c in sv)


def _mojibake_fix_sql(expr: str) -> str:
    from embeddingsearch_spark.functions.text import MOJIBAKE_PAIRS

    t = expr
    for moji, fixed in sorted(MOJIBAKE_PAIRS, key=lambda p: -len(p[0])):
        t = f"replace({t}, {_sql_chr(moji)}, {_sql_chr(fixed)})"
    return t


def _mojibake_suffix_sql() -> str:
    from embeddingsearch_spark.functions.text import MOJIBAKE_PAIRS

    damaged = {f: m for m, f in MOJIBAKE_PAIRS}
    suffix = (
        " caf" + damaged["\u00e9"] + " don" + damaged["\u2019"]
        + "t " + damaged["\u201c"] + "quoted" + damaged["\u201d"]
        + " " + damaged["\u2026"]
    )
    return _sql_chr(suffix)


FIX_MOJIBAKE_SQL = f"""WITH dmg AS (
  SELECT doc_id, text || {_mojibake_suffix_sql()} AS d FROM documents
)
SELECT doc_id, length(d) AS n_chars_before,
       {_mojibake_fix_sql('d')} AS text,
       length({_mojibake_fix_sql('d')}) AS n_chars_after
FROM dmg"""


def q_gopher_rules(spark, sf_dir):
    """The Gopher Table-A1 document rules as one scan-stage projection,
    over docs with planted rule violations (symbol runs, bullet lines,
    ellipsis endings) so every rule fires both ways. min_words=10 keeps
    the word-count rule live at testdata doc lengths."""
    docs = tables.load(spark, sf_dir, "documents")
    d = F.col("doc_id")
    planted = docs.select(
        "doc_id",
        F.concat(
            F.when(d % 4 == 0, F.lit("### ")).otherwise(F.lit("")),
            F.col("text"),
            F.when(d % 5 == 0, F.lit("\n- bullet item")).otherwise(
                F.lit("")
            ),
            F.when(d % 7 == 0, F.lit("\nto be continued...")).otherwise(
                F.lit("")
            ),
        ).alias("text"),
    )
    return repetition.gopher_rules(
        planted, "doc_id", "text", min_words=10
    )


_GOPHER_SW = ", ".join(f"'{w}'" for w in repetition.GOPHER_STOPWORDS)

GOPHER_RULES_SQL = rf"""WITH planted AS (
  SELECT doc_id,
         CASE WHEN doc_id % 4 = 0 THEN '### ' ELSE '' END
         || text
         || CASE WHEN doc_id % 5 = 0
                 THEN chr(10) || '- bullet item' ELSE '' END
         || CASE WHEN doc_id % 7 = 0
                 THEN chr(10) || 'to be continued...' ELSE '' END AS text
  FROM documents
),
m AS (
  SELECT doc_id,
         CAST(len({TOKS_SQL}) AS DOUBLE) AS n_words,
         {TOKS_SQL} AS toks,
         CAST(length(text) AS DOUBLE) AS n_chars,
         CAST(length(text)
              - length(regexp_replace(text, '\s', '', 'g')) AS DOUBLE)
           AS n_space,
         CAST(length(text) - length(replace(text, '#', '')) AS DOUBLE)
           AS n_hash,
         (length(text)
          - length(regexp_replace(text, '\.\.\.', '', 'g'))) / 3.0
           AS n_ellipsis,
         string_split(text, chr(10)) AS lines
  FROM planted
),
r AS (
  SELECT doc_id, n_words,
         CASE WHEN n_words = 0 THEN 0.0
              ELSE (n_chars - n_space) / n_words END AS mean_wl,
         (n_hash + n_ellipsis)
           / CASE WHEN n_words = 0 THEN 1.0 ELSE n_words END
           AS symbol_ratio,
         CAST(len(list_filter(lines,
              l -> regexp_matches(ltrim(l), '^[-*•]'))) AS DOUBLE)
           / len(lines) AS bullet_frac,
         CAST(len(list_filter(lines,
              l -> regexp_matches(rtrim(l), '\.\.\.$'))) AS DOUBLE)
           / len(lines) AS ellipsis_frac,
         CAST(len(list_filter(toks,
              t -> regexp_matches(t, '\p{{L}}'))) AS DOUBLE)
           / CASE WHEN n_words = 0 THEN 1.0 ELSE n_words END
           AS alpha_frac,
         len(list_intersect(
              list_distinct(list_transform(toks, t -> lower(t))),
              [{_GOPHER_SW}])) AS n_stop_hits
  FROM m
)
SELECT doc_id,
       CAST(n_words AS BIGINT) AS n_words,
       round(mean_wl, {RD}) AS mean_word_len,
       round(symbol_ratio, {RD}) AS symbol_ratio,
       round(bullet_frac, {RD}) AS bullet_frac,
       round(ellipsis_frac, {RD}) AS ellipsis_frac,
       round(alpha_frac, {RD}) AS alpha_frac,
       CAST(n_stop_hits AS INT) AS n_stop_hits,
       (n_words >= 10 AND n_words <= 100000) AS r_words,
       (mean_wl >= 3.0 AND mean_wl <= 10.0) AS r_word_len,
       (symbol_ratio <= 0.1) AS r_symbol,
       (bullet_frac <= 0.9) AS r_bullet,
       (ellipsis_frac <= 0.3) AS r_ellipsis,
       (alpha_frac >= 0.8) AS r_alpha,
       (n_stop_hits >= 2) AS r_stop,
       ((n_words >= 10 AND n_words <= 100000)
        AND (mean_wl >= 3.0 AND mean_wl <= 10.0)
        AND (symbol_ratio <= 0.1)
        AND (bullet_frac <= 0.9)
        AND (ellipsis_frac <= 0.3)
        AND (alpha_frac >= 0.8)
        AND (n_stop_hits >= 2)) AS keep
FROM r"""


def q_unimax_alloc(spark, sf_dir):
    """UniMax token-budget allocation across sources (budget = half the
    corpus tokens, cap 3 epochs): small sources fully repeated up to the
    cap, the remainder split uniformly — the closed-form waterfilling."""
    from embeddingsearch_spark.functions import text as tfn
    from embeddingsearch_spark.operators import splits

    docs = tables.load(spark, sf_dir, "documents").select(
        "source", tfn.token_count(F.col("text")).alias("n_toks")
    )
    out = splits.unimax_allocation(
        docs, "source", size_col="n_toks", budget_frac=0.5, max_epochs=3.0
    )
    return out.select(
        "source",
        F.col("n").cast("bigint").alias("n_tokens"),
        F.round("cap", RD).alias("cap"),
        F.round("alloc", RD).alias("alloc"),
        F.round("epochs", RD).alias("epochs"),
    )


UNIMAX_ALLOC_SQL = f"""WITH d AS (
  SELECT source, len({TOKS_SQL}) AS nt FROM documents
),
c AS (SELECT source, CAST(sum(nt) AS DOUBLE) AS n FROM d GROUP BY source),
tot AS (SELECT 0.5 * sum(n) AS b, count(*) AS L FROM c),
s AS (
  SELECT source, n, n * 3.0 AS cap,
         row_number() OVER (ORDER BY n * 3.0 ASC, source ASC) AS i,
         sum(n * 3.0) OVER (ORDER BY n * 3.0 ASC, source ASC
                            ROWS UNBOUNDED PRECEDING) AS prefix
  FROM c
),
f AS (
  SELECT max(CASE WHEN prefix - cap + cap * (tot.L - i + 1) <= tot.b
             THEN i END) AS istar,
         max(CASE WHEN prefix - cap + cap * (tot.L - i + 1) <= tot.b
             THEN prefix END) AS pstar
  FROM s, tot
),
lvl AS (SELECT coalesce(istar, 0) AS istar, coalesce(pstar, 0.0) AS pstar
        FROM f)
SELECT s.source, CAST(s.n AS BIGINT) AS n_tokens,
       round(s.cap, {RD}) AS cap,
       round(CASE WHEN lvl.istar >= tot.L THEN s.cap
                  WHEN s.cap <= (tot.b - lvl.pstar) / (tot.L - lvl.istar)
                  THEN s.cap
                  ELSE (tot.b - lvl.pstar) / (tot.L - lvl.istar) END,
             {RD}) AS alloc,
       round(CASE WHEN lvl.istar >= tot.L THEN s.cap
                  WHEN s.cap <= (tot.b - lvl.pstar) / (tot.L - lvl.istar)
                  THEN s.cap
                  ELSE (tot.b - lvl.pstar) / (tot.L - lvl.istar) END / s.n,
             {RD}) AS epochs
FROM s, lvl, tot"""


# OOV gate vocabulary size: the synthetic corpus has ~31 distinct tokens,
# so V=16 leaves a meaningful out-of-vocabulary tail to measure.
_OOV_V = 16


def q_oov_rate(spark, sf_dir):
    """Per-doc out-of-vocabulary rate vs the corpus's top-16 tokens by
    corpus frequency — the vocabulary-coverage quality gate (drop docs
    the tokenizer would shred into rare pieces)."""
    from embeddingsearch_spark.operators import tfidf

    docs = tables.load(spark, sf_dir, "documents")
    docs = docs.repartition(spark.sparkContext.defaultParallelism)
    out = tfidf.oov_profile(docs, vocab_size=_OOV_V)
    return out.select(
        "doc_id",
        "n_tokens",
        "n_oov",
        F.round("oov_rate", RD).alias("oov_rate"),
    )


OOV_RATE_SQL = f"""WITH toks AS (
  SELECT doc_id, unnest({_LOWER_TOKS_SQL}) AS token FROM documents
),
cf AS (SELECT token, count(*) AS cf FROM toks GROUP BY token),
vocab AS (SELECT token FROM cf ORDER BY cf DESC, token ASC LIMIT {_OOV_V}),
per AS (
  SELECT t.doc_id, count(*) AS n_tokens,
         sum(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) AS n_oov
  FROM toks t LEFT JOIN vocab v USING (token) GROUP BY t.doc_id
)
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(n_oov AS BIGINT) AS n_oov,
       round(CAST(n_oov AS DOUBLE) / n_tokens, {RD}) AS oov_rate
FROM per"""


QUERIES = {
    "token_count": (q_token_count, TOKEN_COUNT_SQL),
    "oov_rate": (q_oov_rate, OOV_RATE_SQL),
    "tfidf_topk": (q_tfidf_topk, TFIDF_TOPK_SQL),
    "vocab_df": (q_vocab_df, VOCAB_DF_SQL),
    "quality_classifier": (q_quality_classifier, QUALITY_CLASSIFIER_SQL),
    "corpus_stats": (q_corpus_stats, CORPUS_STATS_SQL),
    "token_histogram": (q_token_histogram, TOKEN_HISTOGRAM_SQL),
    "token_heavy_hitters": (q_token_heavy_hitters, TOKEN_HEAVY_HITTERS_SQL),
    "phrase_pmi": (q_phrase_pmi, PHRASE_PMI_SQL),
    "bpe_pair_merges": (q_bpe_pair_merges, BPE_PAIR_MERGES_SQL),
    "bpe_encode": (q_bpe_encode, BPE_ENCODE_SQL),
    "dsir_select": (q_dsir_select, DSIR_SELECT_SQL),
    "eval_holdout": (q_eval_holdout, EVAL_HOLDOUT_SQL),
    "contamination": (q_contamination, CONTAMINATION_SQL),
    "winnow_contamination": (
        q_winnow_contamination,
        _winnow_contamination_sql(),
    ),
    "pii_redact": (q_pii_redact, PII_REDACT_SQL),
    "corpus_mix": (q_corpus_mix, CORPUS_MIX_SQL),
    "mix_temperature": (q_mix_temperature, MIX_TEMPERATURE_SQL),
    "unimax_alloc": (q_unimax_alloc, UNIMAX_ALLOC_SQL),
    "gopher_rules": (q_gopher_rules, GOPHER_RULES_SQL),
    "text_normalize": (q_text_normalize, TEXT_NORMALIZE_SQL),
    "fix_mojibake": (q_fix_mojibake, FIX_MOJIBAKE_SQL),
    "html_extract": (q_html_extract, HTML_EXTRACT_SQL),
    "web_curation": (q_web_curation, WEB_CURATION_SQL),
    "seq_pack": (q_seq_pack, SEQ_PACK_SQL),
    "length_batches": (q_length_batches, LENGTH_BATCHES_SQL),
    "batch_pad_stats": (q_batch_pad_stats, BATCH_PAD_STATS_SQL),
    "repetition_filter": (q_repetition_filter, REPETITION_FILTER_SQL),
    "epoch_shuffle": (q_epoch_shuffle, EPOCH_SHUFFLE_SQL),
    "bpe_token_count": (q_bpe_token_count, BPE_TOKEN_COUNT_SQL),
    "quality_score": (q_quality_score, QUALITY_SCORE_SQL),
    "quality_quantiles": (q_quality_quantiles, QUALITY_QUANTILES_SQL),
    "vocab_drift": (q_vocab_drift, VOCAB_DRIFT_SQL),
    "source_quality_profile": (q_source_quality_profile, _sqp_sql()),
    "lang_id": (q_lang_id, LANG_ID_SQL),
    "lang_id_model": (q_lang_id_model, LANG_ID_MODEL_SQL),
    "doc_fingerprint": (q_fingerprint, FINGERPRINT_SQL),
    "doc_chunks": (q_doc_chunks, DOC_CHUNKS_SQL),
    "cdc_chunks": (q_cdc_chunks, CDC_CHUNKS_SQL),
    "cdc_dedup": (q_cdc_dedup, CDC_DEDUP_SQL),
    "doc_split": (q_doc_split, DOC_SPLIT_SQL),
    "training_corpus": (q_training_corpus, TRAINING_CORPUS_SQL),
}


# Bench setup/serve seam (see suite/__init__): model TRAINING is the
# build-time leg; the timed serve is broadcast-model prediction.
SETUP_SERVE = {
    "lang_id_model": (_langid_model_setup, _langid_model_serve),
}
