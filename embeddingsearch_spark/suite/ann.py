"""Similarity-search queries: exact brute-force cosine top-k (the
reference's own scan strategy, SURVEY.md §4 X13) and the IVF-bucketed
scale path, over the embeddings table."""

from __future__ import annotations

from pyspark.sql import functions as F

from embeddingsearch_spark import tables
from embeddingsearch_spark.constants import ROUND_DIGITS as RD
from embeddingsearch_spark.operators import ann as ann_ops

_COS = """CASE WHEN sqrt(sum(x*x))*sqrt(sum(y*y)) = 0 THEN 0.5
        ELSE (sum(x*y)/(sqrt(sum(x*x))*sqrt(sum(y*y))) + 1.0)/2.0 END"""


def _queries_df(spark, sf_dir):
    return (
        tables.load(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < 4)
        .select(F.col("vec_id").alias("query_id"), "embedding")
    )


def q_ann_topk(spark, sf_dir):
    corpus = tables.load(spark, sf_dir, "embeddings")
    return ann_ops.brute_force_topk(corpus, _queries_df(spark, sf_dir), k=10)


ANN_TOPK_SQL = f"""WITH q AS (
  SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 4
),
elems AS (
  SELECT q.query_id, e.vec_id,
         CAST(unnest(e.embedding) AS DOUBLE) AS x,
         CAST(unnest(q.qv) AS DOUBLE) AS y
  FROM embeddings e, q
),
sims AS (
  SELECT query_id, vec_id, {_COS} AS sim
  FROM elems GROUP BY query_id, vec_id
),
ranked AS (
  SELECT query_id, vec_id, round(sim, {RD}) AS cosine,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY round(sim, {RD}) DESC, vec_id ASC) AS rank
  FROM sims
)
SELECT query_id, vec_id, cosine, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= 10"""


def q_embedding_neardup(spark, sf_dir):
    """Embedding-cosine near-dup: all pairs within the same label block
    (blocking key bounds the quadratic pair count) above 0.65 cosine (threshold sized to the testdata distribution)."""
    emb = tables.load(spark, sf_dir, "embeddings")
    a = emb.select(
        F.col("label"),
        F.col("vec_id").alias("id_a"),
        F.col("embedding").alias("va"),
    )
    b = emb.select(
        F.col("label"),
        F.col("vec_id").alias("id_b"),
        F.col("embedding").alias("vb"),
    )
    from embeddingsearch_spark.functions.similarity import cosine

    j = a.join(b, "label").filter(F.col("id_a") < F.col("id_b"))
    sim = cosine(F.col("va"), F.col("vb"))
    return (
        j.select("label", "id_a", "id_b", F.round(sim, RD).alias("cosine"))
        .filter(F.col("cosine") >= 0.65)
    )


EMBEDDING_NEARDUP_SQL = f"""WITH pairs AS (
  SELECT a.label, a.vec_id AS id_a, b.vec_id AS id_b,
         a.embedding AS va, b.embedding AS vb
  FROM embeddings a JOIN embeddings b
    ON a.label = b.label AND a.vec_id < b.vec_id
),
elems AS (
  SELECT label, id_a, id_b,
         CAST(unnest(va) AS DOUBLE) AS x, CAST(unnest(vb) AS DOUBLE) AS y
  FROM pairs
),
sims AS (
  SELECT label, id_a, id_b, {_COS} AS sim
  FROM elems GROUP BY label, id_a, id_b
)
SELECT label, id_a, id_b, round(sim, {RD}) AS cosine
FROM sims WHERE round(sim, {RD}) >= 0.65"""


QUERIES = {
    "ann_topk": (q_ann_topk, ANN_TOPK_SQL),
    "embedding_neardup": (q_embedding_neardup, EMBEDDING_NEARDUP_SQL),
}
