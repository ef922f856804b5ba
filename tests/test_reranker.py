"""HttpReranker: mocked-transport contract + Spark rerank_topk stage."""

from pyspark.sql import functions as F

from embeddingsearch_spark.sources.reranker import (
    HttpReranker,
    rerank_topk,
)


def _mock_transport(calls):
    """Scores = document length (deterministic, visible to asserts)."""

    def transport(url, payload, headers, timeout):
        calls.append(
            {
                "url": url,
                "model": payload["model"],
                "query": payload["query"],
                "n_docs": len(payload["documents"]),
                "auth": headers.get("Authorization"),
            }
        )
        return {
            "results": [
                {"index": i, "relevance_score": float(len(d))}
                for i, d in enumerate(payload["documents"])
            ]
        }

    return transport


def test_rerank_batching_and_auth():
    calls = []
    rr = HttpReranker(
        url="http://x/rerank",
        model="ce-small",
        api_key="sekret",
        batch_size=2,
        transport=_mock_transport(calls),
    )
    docs = ["a", "bbb", "cc", "dddd", "e"]
    scores = rr.rerank("the query", docs)
    assert scores == [1.0, 3.0, 2.0, 4.0, 1.0]
    # 5 docs / batch 2 -> 3 POSTs, all authed, all same query
    assert len(calls) == 3
    assert [c["n_docs"] for c in calls] == [2, 2, 1]
    assert all(c["auth"] == "Bearer sekret" for c in calls)
    assert all(c["query"] == "the query" for c in calls)


def test_rerank_count_mismatch_raises():
    import pytest

    def bad(url, payload, headers, timeout):
        return {"results": [{"index": 0, "relevance_score": 1.0}]}

    rr = HttpReranker(url="u", model="m", transport=bad, batch_size=8)
    with pytest.raises(ValueError, match="returned 1 scores for 2"):
        rr.rerank("q", ["a", "b"])


def test_rerank_topk_stage(spark):
    calls = []
    rr = HttpReranker(
        url="http://x/rerank",
        model="ce",
        batch_size=8,
        transport=_mock_transport(calls),
    )
    candidates = spark.createDataFrame(
        [
            (1, 10, "short"),
            (1, 11, "a much longer candidate text"),
            (1, 12, "medium text"),
            (2, 20, "xx"),
        ],
        "query_id long, doc_id long, text string",
    )
    queries = spark.createDataFrame(
        [(1, "q one"), (2, "q two")], "query_id long, text string"
    )
    out = {
        (r["query_id"], r["rank"]): r
        for r in rerank_topk(
            candidates, queries, rr, k=2
        ).collect()
    }
    # longest text wins under the mock scorer
    assert out[(1, 1)]["doc_id"] == 11
    assert out[(1, 2)]["doc_id"] == 12
    assert out[(2, 1)]["doc_id"] == 20
    assert (1, 3) not in out  # k=2 cap


def test_rerank_rejects_bad_provider_indexes():
    import pytest

    def negative(url, payload, headers, timeout):
        n = len(payload["documents"])
        return {
            "results": [
                {"index": -(i + 1), "relevance_score": 1.0}
                for i in range(n)
            ]
        }

    rr = HttpReranker(url="u", model="m", transport=negative)
    with pytest.raises(ValueError, match="outside batch"):
        rr.rerank("q", ["a", "b"])

    def dup(url, payload, headers, timeout):
        n = len(payload["documents"])
        return {
            "results": [
                {"index": 0, "relevance_score": 1.0} for _ in range(n)
            ]
        }

    rr2 = HttpReranker(url="u", model="m", transport=dup)
    with pytest.raises(ValueError, match="duplicate index"):
        rr2.rerank("q", ["a", "b"])


def test_rerank_topk_string_ids(spark):
    calls = []
    rr = HttpReranker(
        url="u", model="m", transport=_mock_transport(calls)
    )
    candidates = spark.createDataFrame(
        [("q1", "url-a", "long text wins here"), ("q1", "url-b", "x")],
        "query_id string, doc_id string, text string",
    )
    queries = spark.createDataFrame(
        [("q1", "whatever")], "query_id string, text string"
    )
    out = rerank_topk(candidates, queries, rr, k=2).collect()
    got = {r["rank"]: r["doc_id"] for r in out}
    assert got == {1: "url-a", 2: "url-b"}
