"""Link-graph operators: PageRank (power iteration).

Web-curation pipelines use link-graph centrality (PageRank / harmonic
centrality, both public) as a document/domain quality signal — the
CommonCrawl-style "domain authority" gate that complements the
content-side gates in `pipeline.curate`.

Spark-first shape, same discipline as the k-means build
(`ann.kmeans_centroids`): each power iteration is ONE declarative pass
— edges join the current rank vector on src (a corpus-sized hash join
on the edge key), contributions aggregate per dst with map-side
combine, and the new rank frame is lazily checkpointed so lineage stays
O(1) per iteration instead of stacking the whole history into one plan.
Out-degrees are computed once and reused by every iteration.

Declared semantics (the classic unnormalized variant — deterministic
and engine-reproducible): r₀(v) = 1; r_{t+1}(v) = (1−d) + d·Σ_{u→v}
r_t(u)/outdeg(u). Dangling nodes (no out-edges) keep receiving rank
but redistribute none — document-level ranking is insensitive to the
lost mass, and the fixed-iteration recurrence is exactly replayable as
chained SQL CTEs (the oracle's shape). Self-loops should be removed
upstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from embeddingsearch_spark.constants import ROUND_DIGITS


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    iters: int = 3,
    damping: float = 0.85,
) -> DataFrame:
    """``(node, rank)`` after ``iters`` power iterations, rank rounded
    to ROUND_DIGITS. Nodes = distinct src ∪ dst of ``edges``."""
    if iters < 1:
        raise ValueError("iters must be >= 1")
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        # nodes and degrees are reused by every iteration — pin them
        .localCheckpoint(eager=False)
    )
    deg = (
        e.groupBy("src")
        .agg(F.count(F.lit(1)).alias("deg"))
        .localCheckpoint(eager=False)
    )
    ranks = nodes.withColumn("rank", F.lit(1.0))
    base = float(1.0 - damping)
    for _ in range(iters):
        contribs = (
            e.join(ranks.withColumnRenamed("node", "src"), "src")
            .join(deg, "src")
            .select(
                F.col("dst").alias("node"),
                (F.col("rank") / F.col("deg")).alias("_m"),
            )
            .groupBy("node")
            .agg(F.sum("_m").alias("_in"))
        )
        ranks = (
            nodes.join(contribs, "node", "left_outer")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.lit(damping) * F.coalesce("_in", F.lit(0.0))
                ).alias("rank"),
            )
            # one materialized frame per iteration: without this the
            # final plan nests every iteration's joins (the k-means
            # lineage lesson, ann.py:kmeans_centroids)
            .localCheckpoint(eager=False)
        )
    return ranks.select(
        "node", F.round("rank", ROUND_DIGITS).alias("rank")
    )
