"""Corpus-cleanup queries: C4-style boilerplate line removal and unigram
LM (perplexity) quality scoring — over the documents table with planted
boilerplate so the operators have real positives."""

from __future__ import annotations

from pyspark.sql import functions as F

from embeddingsearch_spark import tables
from embeddingsearch_spark.constants import ROUND_DIGITS as RD
from embeddingsearch_spark.operators import boilerplate, lmscore

TOKS_SQL = r"""CASE WHEN length(trim(text)) = 0 THEN []
  ELSE regexp_split_to_array(trim(text), '\s+') END"""

_FOOTER = "All rights reserved - example footer"
_BANNER = "This site uses cookies please accept"


def _planted(spark, sf_dir):
    """Boilerplate planted across docs: every 3rd doc gets a shared
    footer line, every 4th a shared banner line — document frequencies in
    the hundreds, far over the max_df=2 cut; original lines stay rare."""
    docs = tables.load(spark, sf_dir, "documents").select("doc_id", "text")
    d = F.col("doc_id")
    return docs.select(
        "doc_id",
        F.concat(
            F.when(d % 4 == 0, F.lit(_BANNER + "\n")).otherwise(F.lit("")),
            F.col("text"),
            F.when(d % 3 == 0, F.lit("\n" + _FOOTER)).otherwise(F.lit("")),
        ).alias("text"),
    )


_PLANTED_SQL = f"""planted AS (
  SELECT doc_id,
         CASE WHEN doc_id % 4 = 0 THEN '{_BANNER}' || chr(10) ELSE '' END
         || text
         || CASE WHEN doc_id % 3 = 0 THEN chr(10) || '{_FOOTER}' ELSE '' END
           AS text
  FROM documents
)"""


def q_boilerplate_lines(spark, sf_dir):
    """Remove lines appearing in >2 documents and rebuild each doc —
    planted banner/footer vanish, unique content survives in order."""
    return boilerplate.remove_boilerplate_lines(
        _planted(spark, sf_dir), "doc_id", "text", max_df=2
    )


_LINE_FP = r"sha256(regexp_replace(trim(lower(line)), '\s+', ' ', 'g'))"

BOILERPLATE_LINES_SQL = f"""WITH {_PLANTED_SQL},
ls AS (SELECT doc_id, string_split(text, chr(10)) AS l FROM planted),
lines AS (
  SELECT doc_id, u['pos'] AS pos, u['line'] AS line FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, len(l) + 1),
                                 i -> {{'pos': i, 'line': l[i]}})) AS u
    FROM ls)
),
fp AS (
  SELECT doc_id, pos, line, {_LINE_FP} AS line_fp FROM lines
),
freq AS (
  SELECT line_fp, count(*) AS df
  FROM (SELECT DISTINCT doc_id, line_fp FROM fp) GROUP BY line_fp
),
tagged AS (
  SELECT f.doc_id, f.pos, f.line,
         (q.df <= 2 OR length(trim(f.line)) = 0) AS keep
  FROM fp f JOIN freq q USING (line_fp)
),
reb AS (
  SELECT doc_id,
         coalesce(array_to_string(
           list_transform(
             list_sort(list({{'pos': pos, 'line': line}}) FILTER (WHERE keep)),
             s -> s['line']),
           chr(10)), '') AS text,
         count(*) AS n_lines,
         CAST(sum(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT) AS n_removed
  FROM tagged GROUP BY doc_id
)
SELECT p.doc_id, coalesce(r.text, '') AS text,
       coalesce(r.n_lines, 0) AS n_lines,
       coalesce(r.n_removed, 0) AS n_removed
FROM planted p LEFT JOIN reb r USING (doc_id)"""


_PARA_SHARED = "Subscribe to our newsletter for updates"


def _para_planted(spark, sf_dir):
    """Multi-paragraph docs with planted duplication: every 4th doc
    appends a shared promo paragraph (cross-doc duplicates — only doc 0's
    copy survives), every 6th appends a copy of its own first paragraph
    (intra-doc duplicate — the pos-0 copy survives)."""
    docs = tables.load(spark, sf_dir, "documents").select("doc_id", "text")
    d = F.col("doc_id")
    return docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(d % 4 == 0, F.lit("\n\n" + _PARA_SHARED)).otherwise(
                F.lit("")
            ),
            F.when(d % 6 == 0, F.concat(F.lit("\n\n"), F.col("text")))
            .otherwise(F.lit("")),
        ).alias("text"),
    )


def q_paragraph_dedup(spark, sf_dir):
    """Gopher/SlimPajama repeated-paragraph pass over planted
    multi-paragraph docs: duplicate paragraphs keep only their first
    (doc_id, pos) occurrence; docs rebuilt from survivors."""
    return boilerplate.dedup_paragraphs(
        _para_planted(spark, sf_dir), "doc_id", "text"
    )


_PARA_FP = r"sha256(regexp_replace(trim(lower(para)), '\s+', ' ', 'g'))"

PARAGRAPH_DEDUP_SQL = f"""WITH planted AS (
  SELECT doc_id,
         text
         || CASE WHEN doc_id % 4 = 0
                 THEN chr(10) || chr(10) || '{_PARA_SHARED}' ELSE '' END
         || CASE WHEN doc_id % 6 = 0
                 THEN chr(10) || chr(10) || text ELSE '' END AS text
  FROM documents
),
ps AS (SELECT doc_id, string_split(text, chr(10) || chr(10)) AS l
       FROM planted),
paras AS (
  SELECT doc_id, u['pos'] AS pos, u['para'] AS para FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, len(l) + 1),
                                 i -> {{'pos': i, 'para': l[i]}})) AS u
    FROM ps)
),
fp AS (
  SELECT doc_id, pos, para, {_PARA_FP} AS para_fp,
         length(trim(para)) = 0 AS blank
  FROM paras
),
rk AS (
  SELECT doc_id, pos,
         row_number() OVER (PARTITION BY para_fp
                            ORDER BY doc_id, pos) AS rn
  FROM fp WHERE NOT blank
),
tagged AS (
  SELECT f.doc_id, f.pos, f.para,
         (f.blank OR coalesce(r.rn = 1, TRUE)) AS keep
  FROM fp f LEFT JOIN rk r ON r.doc_id = f.doc_id AND r.pos = f.pos
),
reb AS (
  SELECT doc_id,
         coalesce(array_to_string(
           list_transform(
             list_sort(list({{'pos': pos, 'para': para}})
                       FILTER (WHERE keep)),
             s -> s['para']),
           chr(10) || chr(10)), '') AS text,
         count(*) AS n_paragraphs,
         CAST(sum(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT) AS n_removed
  FROM tagged GROUP BY doc_id
)
SELECT p.doc_id, coalesce(r.text, '') AS text,
       coalesce(r.n_paragraphs, 0) AS n_paragraphs,
       coalesce(r.n_removed, 0) AS n_removed
FROM planted p LEFT JOIN reb r USING (doc_id)"""


def q_lm_score(spark, sf_dir):
    """Self-scored unigram LM with a 100-token vocabulary (small K forces
    real OOV traffic at test scale): per-doc token count, OOV count,
    average NLL, perplexity."""
    docs = tables.load(spark, sf_dir, "documents")
    out = lmscore.unigram_scores(
        docs, "doc_id", "text", vocab_size=100, smoothing=1.0
    )
    return out.select(
        "doc_id",
        "n_tokens",
        "n_oov",
        F.round("avg_nll", RD).alias("avg_nll"),
        F.round("perplexity", RD).alias("perplexity"),
    )


_LTOKS = TOKS_SQL.replace("text", "lower(text)")

LM_SCORE_SQL = f"""WITH toks AS (
  SELECT doc_id, unnest({_LTOKS}) AS tok FROM documents
),
counts AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok),
vocab AS (SELECT tok, c FROM counts ORDER BY c DESC, tok LIMIT 100),
tot AS (SELECT count(*) AS n FROM toks),
kk AS (SELECT count(*) AS k FROM vocab),
sc AS (
  SELECT t.doc_id, coalesce(v.c, 0) AS c
  FROM toks t LEFT JOIN vocab v USING (tok)
),
agg AS (
  SELECT doc_id, count(*) AS n_tokens,
         CAST(sum(CASE WHEN c = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
         avg(-ln((c + 1.0) / (tot.n + 1.0 * (kk.k + 1)))) AS avg_nll
  FROM sc, tot, kk GROUP BY doc_id
)
SELECT doc_id, n_tokens, n_oov,
       round(avg_nll, {RD}) AS avg_nll,
       round(exp(avg_nll), {RD}) AS perplexity
FROM agg"""


def q_ppl_buckets_by(spark, sf_dir):
    """Per-SOURCE head/middle/tail perplexity cut (CCNet's per-language
    shape): exact ntile(3) within each source in (perplexity, doc_id)
    order — rank from the range-partitioned two-pass per-group
    machinery, never a group-partitioned window."""
    docs = tables.load(spark, sf_dir, "documents")
    return lmscore.perplexity_buckets_by(
        docs, "doc_id", "text", "source",
        n_buckets=3, vocab_size=100, smoothing=1.0,
    )


PPL_BUCKETS_BY_SQL = f"""WITH toks AS (
  SELECT doc_id, unnest({_LTOKS}) AS tok FROM documents
),
counts AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok),
vocab AS (SELECT tok, c FROM counts ORDER BY c DESC, tok LIMIT 100),
tot AS (SELECT count(*) AS n FROM toks),
kk AS (SELECT count(*) AS k FROM vocab),
sc AS (
  SELECT t.doc_id, coalesce(v.c, 0) AS c
  FROM toks t LEFT JOIN vocab v USING (tok)
),
agg AS (
  SELECT doc_id,
         avg(-ln((c + 1.0) / (tot.n + 1.0 * (kk.k + 1)))) AS avg_nll
  FROM sc, tot, kk GROUP BY doc_id
),
sel AS (
  SELECT a.doc_id, d.source, round(exp(a.avg_nll), {RD}) AS perplexity
  FROM agg a JOIN documents d USING (doc_id)
  WHERE a.avg_nll IS NOT NULL
),
nt AS (
  SELECT doc_id, source, perplexity,
         ntile(3) OVER (PARTITION BY source
                        ORDER BY perplexity ASC, doc_id ASC) AS bucket
  FROM sel
)
SELECT doc_id, source, perplexity, bucket,
       CASE bucket WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
            ELSE 'tail' END AS segment
FROM nt"""


def q_bigram_lm(spark, sf_dir):
    """Interpolated bigram LM (Jelinek–Mercer, lam=0.7) self-scored with
    the 100-token-vocab unigram backoff: per-doc bigram count, avg NLL,
    perplexity. One corpus bigram pass feeds both count tables."""
    docs = tables.load(spark, sf_dir, "documents")
    out = lmscore.bigram_scores(
        docs, "doc_id", "text", vocab_size=100, smoothing=1.0, lam=0.7
    )
    return out.select(
        "doc_id",
        "n_bigrams",
        F.round("avg_nll", RD).alias("avg_nll"),
        F.round("perplexity", RD).alias("perplexity"),
    )


# (1.0 - 0.7) is spelled as an expression so the oracle's backoff weight
# is the same IEEE double Python's 1.0 - lam produces (0.3 the literal
# is a DIFFERENT double).
BIGRAM_LM_SQL = f"""WITH tk AS (
  SELECT doc_id, {_LTOKS} AS t FROM documents
),
bg AS (
  SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
  FROM (SELECT doc_id, t, unnest(range(1, len(t))) AS i
        FROM tk WHERE len(t) >= 2)
),
c2 AS (SELECT w1, w2, count(*) AS c2 FROM bg GROUP BY w1, w2),
c1 AS (SELECT w1, sum(c2) AS c1 FROM c2 GROUP BY w1),
toks AS (SELECT doc_id, unnest({_LTOKS}) AS tok FROM documents),
counts AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok),
vocab AS (SELECT tok, c FROM counts ORDER BY c DESC, tok LIMIT 100),
tot AS (SELECT count(*) AS n FROM toks),
kk AS (SELECT count(*) AS k FROM vocab),
sc AS (
  SELECT bg.doc_id,
         -ln(0.7 * (CAST(c2.c2 AS DOUBLE) / c1.c1)
             + (1.0 - 0.7)
               * ((coalesce(v.c, 0) + 1.0)
                  / (tot.n + 1.0 * (kk.k + 1)))) AS nll
  FROM bg JOIN c2 USING (w1, w2) JOIN c1 USING (w1)
  LEFT JOIN vocab v ON v.tok = bg.w2, tot, kk
),
agg AS (
  SELECT doc_id, count(*) AS n_bigrams, avg(nll) AS avg_nll
  FROM sc GROUP BY doc_id
)
SELECT doc_id, n_bigrams,
       round(avg_nll, {RD}) AS avg_nll,
       round(exp(avg_nll), {RD}) AS perplexity
FROM agg"""


def q_ppl_buckets(spark, sf_dir):
    """CCNet head/middle/tail cut over the self-scored 100-token-vocab
    LM: exact ntile(3) in (perplexity, doc_id) order — head is the
    lowest-perplexity third. Rank comes from the scalable two-pass
    global-ids machinery, never a single-partition sort."""
    docs = tables.load(spark, sf_dir, "documents")
    return lmscore.perplexity_buckets(
        docs, "doc_id", "text", n_buckets=3, vocab_size=100, smoothing=1.0
    )


PPL_BUCKETS_SQL = f"""WITH toks AS (
  SELECT doc_id, unnest({_LTOKS}) AS tok FROM documents
),
counts AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok),
vocab AS (SELECT tok, c FROM counts ORDER BY c DESC, tok LIMIT 100),
tot AS (SELECT count(*) AS n FROM toks),
kk AS (SELECT count(*) AS k FROM vocab),
sc AS (
  SELECT t.doc_id, coalesce(v.c, 0) AS c
  FROM toks t LEFT JOIN vocab v USING (tok)
),
agg AS (
  SELECT doc_id,
         avg(-ln((c + 1.0) / (tot.n + 1.0 * (kk.k + 1)))) AS avg_nll
  FROM sc, tot, kk GROUP BY doc_id
),
sel AS (
  SELECT doc_id, round(exp(avg_nll), {RD}) AS perplexity
  FROM agg WHERE avg_nll IS NOT NULL
),
nt AS (
  SELECT doc_id, perplexity,
         ntile(3) OVER (ORDER BY perplexity ASC, doc_id ASC) AS bucket
  FROM sel
)
SELECT doc_id, perplexity, bucket,
       CASE bucket WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
            ELSE 'tail' END AS segment
FROM nt"""


def q_chunk_mean_pool(spark, sf_dir):
    """Chunk→doc mean pooling: embeddings grouped 10-per-doc and pooled
    elementwise in ONE groupBy (`operators/pooling.mean_pool` — the
    aggregate HOF runs over each group's collected vectors; no
    rows × dim explosion). Vector rendered as ×10⁴-scaled integers
    (floor(x·10⁴ + ½), engine-identical) because the harness
    canonicalizer can't hash ARRAY columns."""
    from embeddingsearch_spark.operators import pooling

    emb = tables.load(spark, sf_dir, "embeddings").select(
        F.expr("vec_id div 10").alias("doc_id"), "embedding"
    )
    pooled = pooling.mean_pool(emb, "doc_id", "embedding")
    scaled = F.transform(
        F.col("pooled"),
        lambda x: F.floor(x * 10000 + F.lit(0.5)).cast("bigint"),
    )
    return pooled.select(
        "doc_id",
        "n_chunks",
        F.array_join(F.transform(scaled, lambda i: i.cast("string")), ",")
        .alias("pooled"),
    )


CHUNK_MEAN_POOL_SQL = """WITH e AS (
  SELECT vec_id // 10 AS doc_id, embedding FROM embeddings
),
x AS (
  SELECT doc_id, generate_subscripts(embedding, 1) AS pos,
         unnest(CAST(embedding AS DOUBLE[])) AS val
  FROM e
),
m AS (SELECT doc_id, pos, avg(val) AS mv FROM x GROUP BY doc_id, pos),
nc AS (SELECT doc_id, count(*) AS n_chunks FROM e GROUP BY doc_id)
SELECT m.doc_id, nc.n_chunks,
       array_to_string(
         list(CAST(floor(mv * 10000 + 0.5) AS BIGINT) ORDER BY pos), ',')
         AS pooled
FROM m JOIN nc USING (doc_id)
GROUP BY m.doc_id, nc.n_chunks"""


# Policy thresholds (tuned to the synthetic corpus so every rule has
# real failures: token p10 ≈ 21, stopword p20 ≈ 0.032, perplexity
# median ≈ 30.01 under the 100-token vocab).
_MIN_TOKENS = 25
_MIN_STOPWORD = 0.03
_MAX_PPL = 30.1


def q_corpus_policy(spark, sf_dir):
    """The assembled filter policy a pretraining pipeline runs per doc:
    length + stopword gates (scan-stage), Gopher repetition gate
    (zero-shuffle mapInPandas), perplexity gate (unigram LM). Three
    id-keyed joins merge the signals; keep = every gate passes, reason =
    first failing gate in a fixed order."""
    from embeddingsearch_spark.functions import text as T
    from embeddingsearch_spark.operators import lmscore, repetition

    docs = tables.load(spark, sf_dir, "documents")
    docs = docs.repartition(spark.sparkContext.defaultParallelism)
    m = T.quality_metrics(F.col("text"))
    quality = docs.select(
        "doc_id",
        m["n_tokens"].alias("n_tokens"),
        m["stopword_ratio"].alias("_sw"),
    )
    rep = repetition.repetition_profile(docs).select(
        "doc_id", F.col("keep").alias("ok_repetition")
    )
    lm = lmscore.unigram_scores(
        docs, "doc_id", "text", vocab_size=100, smoothing=1.0
    ).select("doc_id", "perplexity")
    j = quality.join(rep, "doc_id").join(lm, "doc_id")
    ok_len = F.col("n_tokens") >= _MIN_TOKENS
    ok_sw = F.col("_sw") >= _MIN_STOPWORD
    ok_ppl = F.col("perplexity") <= _MAX_PPL
    reason = (
        F.when(~ok_len, F.lit("too_short"))
        .when(~ok_sw, F.lit("low_stopword"))
        .when(~F.col("ok_repetition"), F.lit("repetitive"))
        .when(~ok_ppl, F.lit("high_perplexity"))
        .otherwise(F.lit(""))
    )
    return j.select(
        "doc_id",
        ok_len.alias("ok_length"),
        ok_sw.alias("ok_stopwords"),
        "ok_repetition",
        ok_ppl.alias("ok_perplexity"),
        (ok_len & ok_sw & F.col("ok_repetition") & ok_ppl).alias("keep"),
        reason.alias("reason"),
    )


from embeddingsearch_spark.functions.text import STOPWORDS as _SW_LIST

_SW_ARR = ", ".join(f"'{w}'" for w in _SW_LIST)
_LOWER_TOKS = TOKS_SQL.replace("text", "lower(text)")

CORPUS_POLICY_SQL = f"""WITH base AS (
  SELECT doc_id, {TOKS_SQL} AS t, string_split(text, chr(10)) AS lines,
         CASE WHEN len({TOKS_SQL}) = 0 THEN 0.0
              ELSE CAST(len(list_filter({_LOWER_TOKS},
                                        tk -> list_contains([{_SW_ARR}], tk)))
                        AS DOUBLE) / len({TOKS_SQL}) END AS sw
  FROM documents
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
),
rep AS (
  SELECT b.doc_id,
         ((CASE WHEN len(b.lines) = 0 THEN 0.0
                ELSE 1.0 - CAST(len(list_distinct(b.lines)) AS DOUBLE)
                           / len(b.lines) END) <= 0.3
          AND (CASE WHEN len(b.t) >= 2
                    THEN coalesce(m2.mx, 0) * 2.0 / len(b.t)
                    ELSE 0.0 END) <= 0.2
          AND (CASE WHEN len(b.t) >= 5
                    THEN coalesce(d5.dup, 0) * 5.0 / len(b.t)
                    ELSE 0.0 END) <= 0.3) AS ok_repetition
  FROM base b LEFT JOIN m2 USING (doc_id) LEFT JOIN d5 USING (doc_id)
),
toks AS (SELECT doc_id, unnest({_LOWER_TOKS}) AS tok FROM documents),
counts AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok),
vocab AS (SELECT tok, c FROM counts ORDER BY c DESC, tok LIMIT 100),
tot AS (SELECT count(*) AS n FROM toks),
kk AS (SELECT count(*) AS k FROM vocab),
lm AS (
  SELECT t.doc_id,
         exp(avg(-ln((coalesce(v.c, 0) + 1.0) / (tot.n + 1.0 * (kk.k + 1)))))
           AS ppl
  FROM toks t LEFT JOIN vocab v USING (tok), tot, kk
  GROUP BY t.doc_id
),
j AS (
  SELECT b.doc_id, len(b.t) AS n_tokens, b.sw, r.ok_repetition, lm.ppl
  FROM base b JOIN rep r USING (doc_id) JOIN lm USING (doc_id)
)
SELECT doc_id,
       n_tokens >= {_MIN_TOKENS} AS ok_length,
       sw >= {_MIN_STOPWORD} AS ok_stopwords,
       ok_repetition,
       ppl <= {_MAX_PPL} AS ok_perplexity,
       (n_tokens >= {_MIN_TOKENS} AND sw >= {_MIN_STOPWORD}
        AND ok_repetition AND ppl <= {_MAX_PPL}) AS keep,
       CASE WHEN n_tokens < {_MIN_TOKENS} THEN 'too_short'
            WHEN sw < {_MIN_STOPWORD} THEN 'low_stopword'
            WHEN NOT ok_repetition THEN 'repetitive'
            WHEN ppl > {_MAX_PPL} THEN 'high_perplexity'
            ELSE '' END AS reason
FROM j"""


def q_curation_funnel(spark, sf_dir):
    """Stage-survivor funnel over the standard gates: input → exact-dedup
    canonicals → length/alpha rule → perplexity cut. ONE aggregation job
    for all stage counts (union + tag, never a count() per stage); the
    lag window runs on the k-row stage table."""
    from embeddingsearch_spark.operators import dedup as dd_ops
    from embeddingsearch_spark.operators import funnel, repetition

    docs = tables.load(spark, sf_dir, "documents")
    s0 = docs.select("doc_id")
    dd = dd_ops.exact_duplicates(docs, "doc_id", "text")
    s1 = dd.filter(F.col("doc_id") == F.col("canonical_id")).select(
        "doc_id"
    )
    gop = repetition.gopher_rules(docs, "doc_id", "text", min_words=25)
    s2 = s1.join(
        gop.filter(F.col("r_words") & F.col("r_alpha")).select("doc_id"),
        "doc_id",
        "left_semi",
    )
    lm = lmscore.unigram_scores(
        docs, "doc_id", "text", vocab_size=100, smoothing=1.0
    )
    s3 = s2.join(
        lm.filter(F.col("perplexity") <= _MAX_PPL).select("doc_id"),
        "doc_id",
        "left_semi",
    )
    return funnel.funnel_stats(
        [("input", s0), ("exact_dedup", s1), ("rules", s2), ("ppl", s3)]
    )


CURATION_FUNNEL_SQL = f"""WITH fp AS (
  SELECT doc_id,
         sha256(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS f
  FROM documents
),
s1 AS (
  SELECT doc_id FROM fp
  WHERE doc_id = (SELECT min(doc_id) FROM fp g WHERE g.f = fp.f)
),
m AS (
  SELECT doc_id, CAST(len({TOKS_SQL}) AS DOUBLE) AS n_words,
         {TOKS_SQL} AS toks
  FROM documents
),
s2 AS (
  SELECT m.doc_id FROM m JOIN s1 USING (doc_id)
  WHERE n_words >= 25 AND n_words <= 100000
    AND CAST(len(list_filter(toks, t -> regexp_matches(t, '\\p{{L}}')))
             AS DOUBLE)
        / CASE WHEN n_words = 0 THEN 1.0 ELSE n_words END >= 0.8
),
toks AS (SELECT doc_id, unnest({_LTOKS}) AS tok FROM documents),
counts AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok),
vocab AS (SELECT tok, c FROM counts ORDER BY c DESC, tok LIMIT 100),
tot AS (SELECT count(*) AS n FROM toks),
kk AS (SELECT count(*) AS k FROM vocab),
sc AS (
  SELECT t.doc_id, coalesce(v.c, 0) AS c
  FROM toks t LEFT JOIN vocab v USING (tok)
),
lm AS (
  SELECT doc_id,
         exp(avg(-ln((c + 1.0) / (tot.n + 1.0 * (kk.k + 1))))) AS ppl
  FROM sc, tot, kk GROUP BY doc_id
),
s3 AS (
  SELECT s2.doc_id FROM s2 JOIN lm USING (doc_id)
  WHERE lm.ppl <= {_MAX_PPL}
),
stages AS (
  SELECT 0 AS stage_idx, 'input' AS stage, count(*) AS n FROM documents
  UNION ALL SELECT 1, 'exact_dedup', count(*) FROM s1
  UNION ALL SELECT 2, 'rules', count(*) FROM s2
  UNION ALL SELECT 3, 'ppl', count(*) FROM s3
)
SELECT stage_idx, stage, n,
       CAST(coalesce(lag(n) OVER (ORDER BY stage_idx) - n, 0) AS BIGINT)
         AS n_dropped,
       round(CASE WHEN coalesce(lag(n) OVER (ORDER BY stage_idx), 0) = 0
                  THEN 0.0
                  ELSE CAST(lag(n) OVER (ORDER BY stage_idx) - n AS DOUBLE)
                       / lag(n) OVER (ORDER BY stage_idx) END, 6)
         AS drop_pct
FROM stages"""


def q_curation_pipeline(spark, sf_dir):
    """The composed `curate(docs, policy)` entry point end-to-end on the
    planted-dup corpus: exact dedup → MinHash near-dup → Gopher
    length/alpha rules → perplexity gate (LM trained on the input) →
    5-gram decontamination vs a derived benchmark — returning the funnel
    table. Every stage reuses an already-oracled operator; this query
    pins the COMPOSITION (stage order, id-chaining, funnel accounting)."""
    from embeddingsearch_spark.functions import text as T
    from embeddingsearch_spark.pipeline import CurationPolicy, curate
    from embeddingsearch_spark.suite.dedup import derive_dd

    dd = derive_dd(spark, sf_dir)
    bench = dd.filter(F.col("doc_id") % 11 == 0).select(
        F.col("doc_id").alias("bench_id"),
        F.concat_ws(" ", F.slice(T.tokens(F.col("text")), 4, 12)).alias(
            "text"
        ),
    )
    policy = CurationPolicy(
        exact_dedup=True,
        neardup=True,
        minhash_k=8,
        bands=4,
        shingle_n=3,
        neardup_threshold=0.5,
        hash_fn="sha256",
        gopher=True,
        min_words=25,
        gopher_rules=("r_words", "r_alpha"),
        perplexity=True,
        max_ppl=_MAX_PPL,
        ppl_vocab=100,
        decontaminate=True,
        contam_ngram=5,
        contam_min_shared=1,
    )
    return curate(dd, policy, benchmark=bench).funnel


def _curation_pipeline_sql() -> str:
    from embeddingsearch_spark.suite.dedup import DD_SQL, pair_ctes_body

    g5 = """list_distinct(list_transform(
      range(1, greatest(1, len({t}) - 4) + 1),
      i -> array_to_string(({t})[i:i+4], ' ')
    ))"""
    bench_toks = TOKS_SQL.replace("text", "btext")
    return f"""WITH {DD_SQL},
fp0 AS (
  SELECT doc_id,
         sha256(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS f
  FROM dd
),
s1 AS (
  SELECT doc_id FROM fp0
  WHERE doc_id = (SELECT min(doc_id) FROM fp0 g WHERE g.f = fp0.f)
),
dd2 AS (SELECT dd.doc_id, dd.text FROM dd JOIN s1 USING (doc_id)),
{pair_ctes_body("dd2")},
s2 AS (
  SELECT doc_id FROM s1
  WHERE doc_id NOT IN (SELECT DISTINCT id_b FROM pfin)
),
m AS (
  SELECT doc_id, CAST(len({TOKS_SQL}) AS DOUBLE) AS n_words,
         {TOKS_SQL} AS toks
  FROM dd
),
s3 AS (
  SELECT m.doc_id FROM m JOIN s2 USING (doc_id)
  WHERE n_words >= 25 AND n_words <= 100000
    AND CAST(len(list_filter(toks, t -> regexp_matches(t, '\\p{{L}}')))
             AS DOUBLE)
        / CASE WHEN n_words = 0 THEN 1.0 ELSE n_words END >= 0.8
),
toks AS (SELECT doc_id, unnest({_LTOKS}) AS tok FROM dd),
counts AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok),
vocab AS (SELECT tok, c FROM counts ORDER BY c DESC, tok LIMIT 100),
tot AS (SELECT count(*) AS n FROM toks),
kk AS (SELECT count(*) AS k FROM vocab),
sc AS (
  SELECT t.doc_id, coalesce(v.c, 0) AS c
  FROM toks t LEFT JOIN vocab v USING (tok)
),
lm AS (
  SELECT doc_id,
         exp(avg(-ln((c + 1.0) / (tot.n + 1.0 * (kk.k + 1))))) AS ppl
  FROM sc, tot, kk GROUP BY doc_id
),
s4 AS (
  -- NULL/absent perplexity (unscorable empty docs) passes the gate:
  -- the LM abstains, it does not veto (pipeline.curate semantics)
  SELECT s3.doc_id FROM s3 LEFT JOIN lm USING (doc_id)
  WHERE lm.ppl <= {_MAX_PPL} OR lm.ppl IS NULL
),
bench AS (
  SELECT doc_id AS bench_id,
         array_to_string(({TOKS_SQL})[4:15], ' ') AS btext
  FROM dd WHERE doc_id % 11 = 0
),
bgrams AS (
  SELECT DISTINCT unnest({g5.format(t=bench_toks)}) AS gram FROM bench
),
cgrams AS (
  SELECT dd.doc_id, unnest({g5.format(t=TOKS_SQL)}) AS gram
  FROM dd JOIN s4 ON s4.doc_id = dd.doc_id
),
contaminated AS (
  SELECT DISTINCT c.doc_id FROM cgrams c JOIN bgrams b USING (gram)
),
s5 AS (
  SELECT doc_id FROM s4
  WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)
),
stages AS (
  SELECT 0 AS stage_idx, 'input' AS stage, count(*) AS n FROM dd
  UNION ALL SELECT 1, 'exact_dedup', count(*) FROM s1
  UNION ALL SELECT 2, 'neardup', count(*) FROM s2
  UNION ALL SELECT 3, 'gopher', count(*) FROM s3
  UNION ALL SELECT 4, 'ppl', count(*) FROM s4
  UNION ALL SELECT 5, 'decontaminate', count(*) FROM s5
)
SELECT stage_idx, stage, n,
       CAST(coalesce(lag(n) OVER (ORDER BY stage_idx) - n, 0) AS BIGINT)
         AS n_dropped,
       round(CASE WHEN coalesce(lag(n) OVER (ORDER BY stage_idx), 0) = 0
                  THEN 0.0
                  ELSE CAST(lag(n) OVER (ORDER BY stage_idx) - n AS DOUBLE)
                       / lag(n) OVER (ORDER BY stage_idx) END, 6)
         AS drop_pct
FROM stages"""


QUERIES = {
    "boilerplate_lines": (q_boilerplate_lines, BOILERPLATE_LINES_SQL),
    "paragraph_dedup": (q_paragraph_dedup, PARAGRAPH_DEDUP_SQL),
    "lm_score": (q_lm_score, LM_SCORE_SQL),
    "ppl_buckets": (q_ppl_buckets, PPL_BUCKETS_SQL),
    "bigram_lm": (q_bigram_lm, BIGRAM_LM_SQL),
    "ppl_buckets_by": (q_ppl_buckets_by, PPL_BUCKETS_BY_SQL),
    "chunk_mean_pool": (q_chunk_mean_pool, CHUNK_MEAN_POOL_SQL),
    "corpus_policy": (q_corpus_policy, CORPUS_POLICY_SQL),
    "curation_funnel": (q_curation_funnel, CURATION_FUNNEL_SQL),
    "curation_pipeline": (q_curation_pipeline, _curation_pipeline_sql()),
}
