"""Similarity search over an embedding column: brute-force exact top-k as
the baseline, IVF-style partition-pruned variant as the 100-TB scale path.

Brute force is the reference's own strategy (full scan per query,
reference Searchdomain.cs:194-197 — SURVEY.md §4 X13): broadcast the query
vectors, compute cosine JVM-side, distributed top-k via per-query window
rank. One corpus scan serves ALL queries at once.

The IVF variant assigns every vector to its nearest centroid at build time
(one scan), then probes only the ``nprobe`` closest centroids' buckets per
query — at 100 TB with the corpus written partitioned/bucketed by
``centroid_id``, the probe reads only those partitions (partition pruning),
turning an O(corpus) scan into O(corpus × nprobe / n_centroids).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from embeddingsearch_spark.constants import ROUND_DIGITS
from embeddingsearch_spark.functions.similarity import cosine


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact cosine top-k: (query_id, vec_id, cosine, rank<=k)."""
    q = F.broadcast(
        queries.select(
            F.col(query_id_col), F.col(vec_col).alias("_qvec")
        )
    )
    sim = cosine(F.col(vec_col), F.col("_qvec"))
    scored = (
        corpus.select(F.col(id_col), F.col(vec_col))
        .crossJoin(q)
        .select(
            F.col(query_id_col),
            F.col(id_col),
            F.round(sim, ROUND_DIGITS).alias("cosine"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col(id_col).asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def assign_centroids(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id_col: str = "centroid_id",
) -> DataFrame:
    """IVF build: nearest centroid per vector (ties → smallest centroid id).
    One broadcast join + per-vector argmax; write the result partitioned by
    centroid_id for probe-time partition pruning."""
    c = F.broadcast(
        centroids.select(
            F.col(centroid_id_col), F.col(vec_col).alias("_cvec")
        )
    )
    scored = corpus.crossJoin(c)
    sim = cosine(F.col(vec_col), F.col("_cvec"))
    w = Window.partitionBy(id_col).orderBy(
        F.round(sim, ROUND_DIGITS).desc(), F.col(centroid_id_col).asc()
    )
    return (
        scored.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") == 1)
        .drop("_r", "_cvec")
    )


def ivf_topk(
    assigned: DataFrame,
    centroids: DataFrame,
    queries: DataFrame,
    k: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    centroid_id_col: str = "centroid_id",
) -> DataFrame:
    """IVF probe: per query, rank centroids, keep ``nprobe`` nearest, search
    only vectors assigned to those centroids."""
    probe = brute_force_topk(
        centroids, queries, k=nprobe,
        id_col=centroid_id_col, vec_col=vec_col, query_id_col=query_id_col,
    ).select(query_id_col, centroid_id_col)
    q = queries.select(F.col(query_id_col), F.col(vec_col).alias("_qvec"))
    cand = (
        assigned.join(F.broadcast(probe), centroid_id_col)
        .join(F.broadcast(q), query_id_col)
    )
    sim = cosine(F.col(vec_col), F.col("_qvec"))
    scored = cand.select(
        F.col(query_id_col),
        F.col(id_col),
        F.round(sim, ROUND_DIGITS).alias("cosine"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col(id_col).asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )
