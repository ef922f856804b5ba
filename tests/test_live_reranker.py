"""Opt-in live cross-encoder integration tests (the `RERANK_URL`
mirror of `test_live_provider.py`'s ollama opt-in).

Skipped unless ``RERANK_URL`` is set, e.g.::

    RERANK_URL=http://localhost:8080/rerank RERANK_MODEL=jina-reranker \
        pytest -m external tests/test_live_reranker.py

They assert the SAME contract the mocked tests pin
(`test_reranker.py`) against a real endpoint speaking the public
Jina/Cohere-style wire shape: POST {model, query, documents} ->
{"results": [{"index", "relevance_score"}]}. ``RERANK_API_KEY`` adds
bearer auth when the provider requires it.
"""

from __future__ import annotations

import os

import pytest

RERANK_URL = os.environ.get("RERANK_URL")

pytestmark = [
    pytest.mark.external,
    pytest.mark.skipif(
        not RERANK_URL,
        reason="set RERANK_URL to run live cross-encoder tests",
    ),
]


def _client(batch_size=32):
    from embeddingsearch_spark.sources.reranker import HttpReranker

    return HttpReranker(
        url=RERANK_URL,
        model=os.environ.get("RERANK_MODEL", "jina-reranker-v1-turbo-en"),
        api_key=os.environ.get("RERANK_API_KEY"),
        batch_size=batch_size,
    )


def test_live_rerank_scores_aligned():
    docs = [
        "the capital of france is paris",
        "gradient descent minimizes a loss function",
        "paris is known for the eiffel tower",
    ]
    scores = _client().rerank("what is the capital of france?", docs)
    # contract: one float per document, order-aligned
    assert len(scores) == len(docs)
    assert all(isinstance(s, float) for s in scores)
    # semantic sanity a real cross-encoder must show: both paris docs
    # outscore the unrelated ML doc
    assert scores[0] > scores[1] and scores[2] > scores[1]


def test_live_rerank_batching_transparent():
    """batch_size=2 over 5 docs → 3 POSTs; scores must equal the
    single-batch result (the provider scores pairs independently)."""
    docs = [f"document number {i} about topic {i % 2}" for i in range(5)]
    one = _client(batch_size=32).rerank("topic 1", docs)
    split = _client(batch_size=2).rerank("topic 1", docs)
    assert len(one) == len(split) == 5
    for a, b in zip(one, split):
        assert abs(a - b) < 1e-6


def test_live_rerank_topk_end_to_end(spark):
    """rerank_topk over a live endpoint: candidates in, reranked rows
    out with deterministic rank tiebreaks."""
    from embeddingsearch_spark.sources.reranker import rerank_topk

    candidates = spark.createDataFrame(
        [
            (1, 10, "paris is the capital of france"),
            (1, 11, "the loss function is minimized by gradient descent"),
            (1, 12, "the eiffel tower stands in paris"),
        ],
        "query_id long, doc_id long, text string",
    )
    queries = spark.createDataFrame(
        [(1, "what is the capital of france?")],
        "query_id long, text string",
    )
    out = rerank_topk(
        candidates, queries, _client(), k=2
    ).orderBy("rank").collect()
    assert [r["rank"] for r in out] == [1, 2]
    assert {r["doc_id"] for r in out} <= {10, 11, 12}
    # the unrelated doc must not win
    assert out[0]["doc_id"] != 11
