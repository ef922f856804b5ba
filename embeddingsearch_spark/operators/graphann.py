"""Graph-based ANN: k-NN-graph build + beam search (the NSW/HNSW
family — Malkov et al., "navigable small world" graphs; public).

The third index family next to IVF (`ann.ivf_topk`) and PQ
(`pq.pq_topk`). A query walks a pre-built neighbor graph: start at
entry points, repeatedly expand the current beam's out-edges, keep the
best ``beam`` candidates, answer with the final top-k. Search cost is
O(entries + hops · beam · degree) vectors scored — independent of
corpus size once the graph exists — which is why the family dominates
single-node ANN benchmarks.

Spark-first reduction (everything deterministic and oracle-able):

- **Build** (`knn_graph`): true HNSW insertion is inherently
  sequential; the declarative equivalent of its result is a blocked
  approximate k-NN graph — multi-assign every vector to its
  ``n_assign`` nearest coarse centroids (multi-assignment stitches
  adjacent blocks so the graph stays navigable across block
  boundaries), generate within-block pairs, keep each node's top-``m``
  neighbors by cosine, then symmetrize (union the reversed edges, so a
  popular neighbor is reachable backwards — HNSW's bidirectional
  links). Blocks are the scale knob (the SemDeDup precedent): vectors
  never self-join globally, and Σ block² bounds the build.
- **Search** (`graph_search`): HNSW's upper layers exist to find good
  entry points; the declarative reduction samples ``n_entry``
  deterministic (md5-ordered) entries and runs a FIXED number of beam
  hops, each hop = one edge join + one union + one per-query rank
  window, with the frontier lazily checkpointed per hop (the
  k-means/PageRank iterative-lineage discipline). The frontier is
  monotone (the union keeps the previous beam), so recall only
  improves with hops.

All scores are remapped cosine rounded to ROUND_DIGITS with (score
desc, id asc) tiebreaks — bit-reproducible in the DuckDB oracle, which
replays build AND every hop as chained CTEs (suite/ann.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from embeddingsearch_spark.constants import ROUND_DIGITS
from embeddingsearch_spark.functions.vectors import dot, norm2
from embeddingsearch_spark.operators.ann import _cosine_from_parts


def knn_graph(
    emb: DataFrame,
    centroids: DataFrame,
    m: int = 6,
    n_assign: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id_col: str = "centroid_id",
) -> DataFrame:
    """Blocked approximate k-NN graph: ``(src, dst, cosine)`` directed
    edges, ≤ 2·m per node after symmetrization (top-``m`` out-edges
    per node plus reversed in-edges, deduplicated).

    ``centroids`` is the coarse quantizer (same contract as
    `ann.ivf_topk`); every vector joins the blocks of its ``n_assign``
    nearest centroids, so neighbors in adjacent blocks are still
    found and the graph stays connected across block seams."""
    # multi-assignment: rank all centroids per vector (C is small by
    # construction — it ships broadcast), keep the n_assign nearest
    c = F.broadcast(
        centroids.select(
            F.col(centroid_id_col),
            F.col(vec_col).alias("_cvec"),
            norm2(F.col(vec_col)).alias("_cn"),
        )
    )
    sim_c = F.round(
        _cosine_from_parts(
            dot(F.col(vec_col), F.col("_cvec")),
            F.col("_vn"),
            F.col("_cn"),
        ),
        ROUND_DIGITS,
    )
    aw = Window.partitionBy(id_col).orderBy(
        F.col("_csim").desc(), F.col("_blk").asc()
    )
    assigned = (
        emb.select(
            F.col(id_col),
            F.col(vec_col),
            norm2(F.col(vec_col)).alias("_vn"),
        )
        .crossJoin(c)
        .select(
            F.col(id_col),
            F.col(centroid_id_col).alias("_blk"),
            sim_c.alias("_csim"),
        )
        .withColumn("_r", F.row_number().over(aw))
        .filter(F.col("_r") <= n_assign)
        .select(id_col, "_blk")
    )
    # within-block candidate pairs (a < b), deduped across the blocks
    # a pair may share; then ONE exact cosine per distinct pair
    a = assigned.select(
        F.col(id_col).alias("_ida"), F.col("_blk")
    )
    b = assigned.select(
        F.col(id_col).alias("_idb"), F.col("_blk")
    )
    pairs = (
        a.join(b, "_blk")
        .filter(F.col("_ida") < F.col("_idb"))
        .select("_ida", "_idb")
        .distinct()
    )
    va = emb.select(
        F.col(id_col).alias("_ida"),
        F.col(vec_col).alias("_va"),
        norm2(F.col(vec_col)).alias("_na"),
    )
    vb = emb.select(
        F.col(id_col).alias("_idb"),
        F.col(vec_col).alias("_vb"),
        norm2(F.col(vec_col)).alias("_nb"),
    )
    scored = pairs.join(va, "_ida").join(vb, "_idb").select(
        "_ida",
        "_idb",
        F.round(
            _cosine_from_parts(
                dot(F.col("_va"), F.col("_vb")),
                F.col("_na"),
                F.col("_nb"),
            ),
            ROUND_DIGITS,
        ).alias("cosine"),
    )
    # symmetrize, then keep each node's top-m out-edges
    directed = scored.select(
        F.col("_ida").alias("src"),
        F.col("_idb").alias("dst"),
        "cosine",
    ).unionByName(
        scored.select(
            F.col("_idb").alias("src"),
            F.col("_ida").alias("dst"),
            "cosine",
        )
    )
    ew = Window.partitionBy("src").orderBy(
        F.col("cosine").desc(), F.col("dst").asc()
    )
    top = (
        directed.withColumn("_r", F.row_number().over(ew))
        .filter(F.col("_r") <= m)
        .select("src", "dst", "cosine")
    )
    # HNSW's bidirectional links: a node must be reachable FROM its
    # neighbors even when it did not make their top-m — union the
    # reversed edges back in, then prune back to 2m per node (HNSW's
    # own degree cap: a popular hub would otherwise accumulate
    # unbounded in-degree reversals and hop cost would stop being
    # O(beam · degree))
    sym = (
        top.unionByName(
            top.select(
                F.col("dst").alias("src"),
                F.col("src").alias("dst"),
                "cosine",
            )
        )
        .groupBy("src", "dst")
        .agg(F.max("cosine").alias("cosine"))
    )
    cap = Window.partitionBy("src").orderBy(
        F.col("cosine").desc(), F.col("dst").asc()
    )
    return (
        sym.withColumn("_r", F.row_number().over(cap))
        .filter(F.col("_r") <= 2 * m)
        .select("src", "dst", "cosine")
    )


def entry_points(
    emb: DataFrame,
    n_entry: int = 4,
    id_col: str = "vec_id",
    salt: str = "nsw_entry",
) -> DataFrame:
    """Deterministic hash-sampled entry nodes (md5 order, id
    tiebreak) — the declarative stand-in for HNSW's top layer. A
    TakeOrdered of ``n_entry`` ids, never a global sort."""
    return (
        emb.select(F.col(id_col))
        .orderBy(
            F.md5(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string"))),
            F.col(id_col).asc(),
        )
        .limit(n_entry)
    )


def graph_search(
    edges: DataFrame,
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    beam: int = 8,
    hops: int = 3,
    n_entry: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Beam search over a `knn_graph`: ``(query_id, vec_id, cosine,
    rank<=k)``. Each hop expands the frontier's out-edges, rescores the
    candidate set against the broadcast queries, and keeps the best
    ``beam`` per query (monotone: the union retains the previous
    frontier). ``hops`` is fixed → the plan is a finite chain and the
    oracle replays it hop by hop."""
    q = F.broadcast(
        queries.select(
            F.col(query_id_col),
            F.col(vec_col).alias("_qvec"),
            norm2(F.col(vec_col)).alias("_qn"),
        )
    )
    vecs = emb.select(
        F.col(id_col).alias("_node"),
        F.col(vec_col).alias("_nvec"),
        norm2(F.col(vec_col)).alias("_nn"),
    )
    sim = F.round(
        _cosine_from_parts(
            dot(F.col("_nvec"), F.col("_qvec")),
            F.col("_nn"),
            F.col("_qn"),
        ),
        ROUND_DIGITS,
    )
    fw = Window.partitionBy(query_id_col).orderBy(
        F.col("_sim").desc(), F.col("_node").asc()
    )

    def score_and_beam(cand: DataFrame) -> DataFrame:
        scored = (
            cand.join(vecs, "_node")
            .join(q, query_id_col)
            .select(query_id_col, "_node", sim.alias("_sim"))
        )
        return (
            scored.withColumn("_r", F.row_number().over(fw))
            .filter(F.col("_r") <= beam)
            .select(query_id_col, "_node", "_sim")
            # pin per hop: hop h's lineage must not replay hops 0..h-1
            .localCheckpoint(eager=False)
        )

    entries = entry_points(emb, n_entry=n_entry, id_col=id_col)
    frontier = score_and_beam(
        queries.select(query_id_col).crossJoin(
            F.broadcast(entries.select(F.col(id_col).alias("_node")))
        )
    )
    esrc = edges.select(
        F.col("src").alias("_node"), F.col("dst").alias("_dst")
    )
    for _ in range(hops):
        expanded = (
            frontier.select(query_id_col, "_node")
            .join(esrc, "_node")
            .select(query_id_col, F.col("_dst").alias("_node"))
        )
        cand = (
            expanded.unionByName(
                frontier.select(query_id_col, "_node")
            ).distinct()
        )
        frontier = score_and_beam(cand)
    return (
        frontier.withColumn("_r", F.row_number().over(fw))
        .filter(F.col("_r") <= k)
        .select(
            query_id_col,
            F.col("_node").alias(id_col),
            F.col("_sim").alias("cosine"),
            F.col("_r").alias("rank"),
        )
    )
