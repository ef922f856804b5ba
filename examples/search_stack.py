"""End-to-end retrieval stack on the synthetic corpus: BM25 (+ PRF
expansion) and dense ANN in parallel, RRF fusion, snippet extraction,
and a mocked cross-encoder rerank of the fused top-k.

Run:  python examples/search_stack.py [sf_dir]   (default sf0.01)
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(sf_dir: str) -> None:
    from pyspark.sql import functions as F

    from embeddingsearch_spark import tables
    from embeddingsearch_spark.functions import text as T
    from embeddingsearch_spark.operators import ann, retrieval
    from embeddingsearch_spark.operators.snippets import best_snippets
    from embeddingsearch_spark.session import get_spark
    from embeddingsearch_spark.sources.reranker import (
        HttpReranker,
        rerank_topk,
    )

    spark = get_spark("search-stack", master="local[8]", shuffle_partitions=8)
    docs = tables.load(spark, sf_dir, "documents")
    emb = tables.load(spark, sf_dir, "embeddings")

    # queries: 4 doc-derived text queries + their embedding twins
    qids = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id")
    )
    tq = docs.join(qids, docs["doc_id"] == qids["query_id"]).select(
        "query_id",
        F.concat_ws(" ", F.slice(T.tokens(F.col("text")), 2, 5)).alias(
            "text"
        ),
    )
    vq = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )

    # sparse (with PRF expansion) ∥ dense, fused by RRF
    lex = retrieval.bm25_prf_topk(docs, tq, k=10, k_fb=5, m_terms=3)
    dense = ann.brute_force_topk(emb, vq, k=10).select(
        "query_id", F.col("vec_id").alias("doc_id"), "rank"
    )
    fused = retrieval.rrf_fuse(
        [lex.select("query_id", "doc_id", "rank"), dense], top_k=5
    )
    print("fused top-5 per query (BM25+PRF ∥ ANN → RRF):")
    fused.orderBy("query_id", "fused_rank").show(20, truncate=False)

    # snippets for the fused results
    hits = fused.select("query_id", "doc_id")
    snips = best_snippets(
        docs.join(hits.select("doc_id").distinct(), "doc_id"),
        tq,
        window=8,
    )
    print("best snippet per fused (query, doc):")
    snips.join(hits, ["query_id", "doc_id"]).orderBy(
        "query_id", "doc_id"
    ).show(10, truncate=60)

    # cross-encoder rerank of the fused candidates (mock transport —
    # swap for a real endpoint URL + api_key in production)
    def mock_transport(url, payload, headers, timeout):
        return {
            "results": [
                {"index": i, "relevance_score": float(len(d) % 97)}
                for i, d in enumerate(payload["documents"])
            ]
        }

    rr = HttpReranker(
        url="http://localhost/rerank",
        model="cross-encoder-mock",
        transport=mock_transport,
    )
    candidates = fused.select("query_id", "doc_id").join(
        docs.select("doc_id", "text"), "doc_id"
    )
    reranked = rerank_topk(candidates, tq, rr, k=3)
    print("cross-encoder reranked top-3:")
    reranked.orderBy("query_id", "rank").show(12, truncate=False)
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01")
