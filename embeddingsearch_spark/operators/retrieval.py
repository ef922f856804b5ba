"""Lexical and hybrid retrieval: BM25 scoring and reciprocal-rank
fusion.

The embedding cascade (operators/search.py) covers semantic retrieval;
real engines pair it with a lexical scorer and fuse the two rankings.
Both operators here are fully declarative and oracle-able:

- **BM25** (Robertson/Spärck Jones; the Lucene `k1`/`b` practical
  variant with the +1-smoothed idf — public): one corpus pass builds
  the postings (doc, term, tf) and per-doc lengths; the query-term set
  (small by construction) broadcasts, so the corpus never shuffles on
  anything except the final (query, doc) aggregation. Term document
  frequencies are computed AFTER the broadcast semi-join — df over all
  postings of a query term equals its global df, so filtering first
  changes nothing but the cost.
- **RRF** (reciprocal-rank fusion, Cormack et al. 2009 — public):
  score(d) = Σ_rankings 1/(k + rank_i(d)). Rankings are
  (query, doc, rank) frames; the union is rank-rows only — tiny
  relative to the corpora that produced them.

Declared semantics: tokens = whitespace split of lower(text) (the
engine's tokenizer, lowercased); query term multiplicity is ignored
(distinct query terms); dl = token count; N and avgdl include
zero-length docs; scores in float64, rounded (ROUND_DIGITS) before
ranking, ties broken by doc id ascending.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from embeddingsearch_spark.constants import ROUND_DIGITS


def _postings(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, term, tf, dl) per distinct doc-term, from one scan."""
    from embeddingsearch_spark.functions.text import tokens

    toks = df.select(
        F.col(id_col),
        tokens(F.lower(F.col(text_col))).alias("_t"),
    ).select(
        F.col(id_col),
        F.size("_t").alias("dl"),
        F.explode("_t").alias("term"),
    )
    return toks.groupBy(id_col, "dl", "term").agg(
        F.count(F.lit(1)).alias("tf")
    )


def bm25_scores(
    docs: DataFrame,
    queries: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    query_text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 score per (query, doc) with at least one term match:
    ``(query_id, doc_id, score, n_matched)``.

    score = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl)),
    idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5))  (Lucene's non-negative
    variant).

    Plan: corpus stats (N, avgdl) are one length-only aggregate (no
    explode); the postings explode happens once, is semi-joined against
    the BROADCAST query-term set (postings for non-query terms never
    leave the scan stage), and the filtered postings frame — bounded by
    query-term matches — is lazily checkpointed so the df aggregation
    and the scoring join both read one materialization."""
    from embeddingsearch_spark.functions.text import tokens

    stats = docs.select(
        F.size(tokens(F.lower(F.col(text_col)))).alias("_dl")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("_dl").alias("avgdl"),
    ).collect()[0]
    n_docs = float(stats["n"])
    avgdl = float(stats["avgdl"] or 0.0) or 1.0

    qterms = (
        queries.select(
            F.col(query_id_col),
            F.explode(
                F.array_distinct(
                    tokens(F.lower(F.col(query_text_col)))
                )
            ).alias("term"),
        )
    )
    post = _postings(docs, id_col, text_col)
    # bounded by query-term matches; read twice (df agg + scoring join)
    matched = post.join(
        F.broadcast(qterms.select("term").distinct()), "term"
    ).localCheckpoint(eager=False)
    dfreq = matched.groupBy("term").agg(
        F.countDistinct(id_col).alias("df")
    )
    idf = F.log(
        F.lit(1.0)
        + (F.lit(n_docs) - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    tf = F.col("tf").cast("double")
    norm = tf + F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.lit(avgdl)
    )
    contrib = idf * tf * F.lit(k1 + 1.0) / norm
    return (
        matched.join(F.broadcast(dfreq), "term")
        .join(F.broadcast(qterms), "term")
        .groupBy(query_id_col, id_col)
        .agg(
            F.round(F.sum(contrib), ROUND_DIGITS).alias("score"),
            F.count(F.lit(1)).alias("n_matched"),
        )
    )


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    **kwargs,
) -> DataFrame:
    """Top-``k`` BM25 docs per query with dense 1-based ranks —
    deterministic (rounded score desc, doc id asc)."""
    id_col = kwargs.get("id_col", "doc_id")
    query_id_col = kwargs.get("query_id_col", "query_id")
    scored = bm25_scores(docs, queries, **kwargs)
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("score").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def rrf_fuse(
    rankings: list[DataFrame],
    query_id_col: str = "query_id",
    id_col: str = "doc_id",
    rank_col: str = "rank",
    k: int = 60,
    top_k: int | None = None,
) -> DataFrame:
    """Reciprocal-rank fusion over ≥1 rankings:
    ``(query_id, doc_id, rrf_score, n_rankings, fused_rank)`` where
    rrf_score = Σ 1/(k + rank_i) over the rankings that contain the
    (query, doc) pair. Rank rows only — no corpus data moves."""
    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking")
    tagged = None
    for r in rankings:
        part = r.select(
            F.col(query_id_col),
            F.col(id_col),
            (
                F.lit(1.0) / (F.lit(float(k)) + F.col(rank_col))
            ).alias("_c"),
        )
        tagged = part if tagged is None else tagged.unionByName(part)
    fused = tagged.groupBy(query_id_col, id_col).agg(
        F.round(F.sum("_c"), ROUND_DIGITS).alias("rrf_score"),
        F.count(F.lit(1)).alias("n_rankings"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("rrf_score").desc(), F.col(id_col).asc()
    )
    fused = fused.withColumn("fused_rank", F.row_number().over(w))
    if top_k is not None:
        fused = fused.filter(F.col("fused_rank") <= top_k)
    return fused
