"""HTTP embedder seam (S5/S6, reference AIProvider.cs:39-133): batched
per-model POSTs with a mocked transport — no network. The transport runs
in executor worker processes, so calls are recorded to files and read back
driver-side."""

from __future__ import annotations

import json
from pathlib import Path

import pytest

from embeddingsearch_spark.operators import index_build
from embeddingsearch_spark.sources.embedder import (
    HttpEmbedder,
    embed_map_in_pandas,
)

DIM = 4


def _recording_transport(record_dir: str):
    """Transport double: logs every call to a file, returns vectors whose
    first component encodes the input order (deterministic, checkable)."""

    def transport(url, payload, headers, timeout):
        import os
        import uuid

        entry = {"url": url, "payload": payload, "headers": headers}
        p = Path(record_dir) / f"{os.getpid()}_{uuid.uuid4().hex}.json"
        p.write_text(json.dumps(entry))
        embs = [
            [float(len(t)), 1.0, 0.0, 0.0] for t in payload["input"]
        ]
        if "openai" in url:
            return {"data": [{"embedding": e} for e in embs]}
        return {"embeddings": embs}

    return transport


def _calls(record_dir: Path) -> list[dict]:
    return [json.loads(p.read_text()) for p in record_dir.glob("*.json")]


def test_batched_per_model_calls(spark, tmp_path):
    rec = tmp_path / "calls"
    rec.mkdir()
    provider = HttpEmbedder(
        kind="ollama",
        url="http://mock:11434/api/embed",
        transport=_recording_transport(str(rec)),
    )
    df = spark.createDataFrame(
        [(f"text {i}", m) for i in range(20) for m in ("m1", "m2")],
        "text string, model string",
    ).coalesce(1)
    out = embed_map_in_pandas(df, provider=provider).collect()
    assert len(out) == 40
    assert all(r["vector"] == [float(len(r["text"])), 1.0, 0.0, 0.0] for r in out)

    calls = _calls(rec)
    # batched: one call per (arrow batch=1 partition, model), NOT per row
    assert len(calls) == 2
    assert {c["payload"]["model"] for c in calls} == {"m1", "m2"}
    assert all(len(c["payload"]["input"]) == 20 for c in calls)


def test_openai_shape_and_auth_header(spark, tmp_path):
    rec = tmp_path / "calls"
    rec.mkdir()
    provider = HttpEmbedder(
        kind="openai",
        url="https://openai.mock/v1/embeddings",
        api_key="sk-test",
        transport=_recording_transport(str(rec)),
    )
    df = spark.createDataFrame(
        [("alpha", "m1")], "text string, model string"
    ).coalesce(1)
    out = embed_map_in_pandas(df, provider=provider).collect()
    assert out[0]["vector"] == [5.0, 1.0, 0.0, 0.0]
    (call,) = _calls(rec)
    assert call["headers"]["Authorization"] == "Bearer sk-test"


def test_build_index_calls_provider_for_misses_only(spark, tmp_path):
    rec = tmp_path / "calls"
    rec.mkdir()
    provider = HttpEmbedder(
        kind="ollama",
        url="http://mock:11434/api/embed",
        transport=_recording_transport(str(rec)),
    )
    ingest = spark.createDataFrame(
        [
            ("sd", "e1", "Mean", None, "text", "Mean", "Cosine", "cached text",
             ["m1"]),
            ("sd", "e2", "Mean", None, "text", "Mean", "Cosine", "new text",
             ["m1"]),
        ],
        "searchdomain string, entity string, entity_probmethod string, "
        "attributes map<string,string>, datapoint string, dp_probmethod "
        "string, simmethod string, text string, models array<string>",
    )
    from embeddingsearch_spark.functions.text import text_hash
    from pyspark.sql import functions as F

    cache = (
        ingest.filter(F.col("entity") == "e1")
        .select(
            text_hash(F.col("text")).alias("text_hash"),
            F.lit("m1").alias("model"),
            F.array(*[F.lit(0.5)] * DIM).alias("vector"),
        )
    )
    result = index_build.build_index(
        ingest, cache, dim=DIM, materialize_embedded=True, provider=provider
    )
    assert result.index_flat.count() == 2
    calls = _calls(rec)
    texts = [t for c in calls for t in c["payload"]["input"]]
    assert texts == ["new text"]  # the cache hit never reached the provider


def test_batch_size_splits_requests(tmp_path):
    rec = tmp_path / "calls"
    rec.mkdir()
    provider = HttpEmbedder(
        kind="ollama",
        url="http://mock/api/embed",
        batch_size=3,
        transport=_recording_transport(str(rec)),
    )
    embs = provider.embed([f"t{i}" for i in range(8)], "m1")
    assert len(embs) == 8
    sizes = sorted(len(c["payload"]["input"]) for c in _calls(rec))
    assert sizes == [2, 3, 3]


def test_bad_kind_rejected():
    with pytest.raises(ValueError):
        HttpEmbedder(kind="nope", url="x").embed(["t"], "m")


# -- provider-backed query embeddings in Engine.search (reference
#    Searchdomain.GetQueryEmbeddings, Searchdomain.cs:212-235) --------------


def _driver_counting_transport(calls: list):
    """Driver-side transport double: Engine._query_embeddings resolves the
    one-query x models-in-use batch on the driver (like the reference's
    per-request serving thread), so a plain list records calls. Returns
    the deterministic-embedder vectors so provider and expression paths
    agree bit-for-bit."""
    from embeddingsearch_spark.sources.embedder import _embed_one

    def transport(url, payload, headers, timeout):
        calls.append({"url": url, "payload": payload})
        embs = [_embed_one(t, payload["model"], DIM) for t in payload["input"]]
        return {"embeddings": embs}

    return transport


def _engine_with_docs(spark):
    from embeddingsearch_spark.api import Engine

    eng = Engine(spark, dim=DIM)
    ingest = spark.createDataFrame(
        [
            ("sd", e, "Mean", None, dp, "Mean", "Cosine", f"{e} {dp} body",
             ["mock:m1", "mock:m2"])
            for e in ("e1", "e2", "e3")
            for dp in ("title", "text")
        ],
        "searchdomain string, entity string, entity_probmethod string, "
        "attributes map<string,string>, datapoint string, "
        "dp_probmethod string, simmethod string, text string, "
        "models array<string>",
    )
    eng.index_entities(ingest)
    return eng


def test_search_provider_miss_batches_per_model_then_cache_hits(spark):
    calls: list = []
    provider = HttpEmbedder(
        kind="ollama",
        url="http://mock:11434/api/embed",
        transport=_driver_counting_transport(calls),
    )
    eng = _engine_with_docs(spark)

    expected = eng.search("какой запрос").collect()  # deterministic path
    got = eng.search("какой запрос", provider=provider).collect()

    # miss: exactly one batched call per model in use, each carrying the
    # query once
    assert len(calls) == 2
    assert sorted(c["payload"]["model"] for c in calls) == [
        "mock:m1",
        "mock:m2",
    ]
    assert all(c["payload"]["input"] == ["какой запрос"] for c in calls)
    # provider vectors == deterministic vectors -> identical ranking rows
    key = lambda r: (r["searchdomain"], r["entity"])  # noqa: E731
    assert sorted(map(tuple, got), key=lambda t: t[:2]) == sorted(
        map(tuple, expected), key=lambda t: t[:2]
    )

    # repeat search: query embeddings now cached -> ZERO provider calls
    again = eng.search("какой запрос", provider=provider).collect()
    assert len(calls) == 2
    assert sorted(map(tuple, again)) == sorted(map(tuple, got))


def test_search_engine_level_provider_and_partial_cache(spark):
    calls: list = []
    provider = HttpEmbedder(
        kind="ollama",
        url="http://mock:11434/api/embed",
        transport=_driver_counting_transport(calls),
    )
    eng = _engine_with_docs(spark)
    eng.provider = provider

    eng.search("q-alpha")
    assert len(calls) == 2

    # Simulate the reference's fill-in branch: drop ONE model's cached
    # query embedding; only that model re-embeds.
    from embeddingsearch_spark.functions.text import text_hash
    from pyspark.sql import functions as F

    qh = spark.range(1).select(
        text_hash(F.lit("q-alpha")).alias("h")
    ).head()["h"]
    eng.embedding_cache = eng.embedding_cache.filter(
        ~((F.col("text_hash") == qh) & (F.col("model") == "mock:m2"))
    ).localCheckpoint(eager=True)

    eng.search("q-alpha")
    assert len(calls) == 3
    assert calls[-1]["payload"]["model"] == "mock:m2"
