"""Opt-in live-provider integration tests.

Skipped unless ``OLLAMA_URL`` is set (e.g.
``OLLAMA_URL=http://localhost:11434 pytest -m external``). They assert
the SAME contract the mocked tests pin (`test_http_embedder.py`,
`test_model_catalog.py`) against a real ollama endpoint — reference
behavior being claimed: AIProvider.cs:39-133 (embeddings) and the
/api/tags catalog fetch.

``OLLAMA_EMBED_MODEL`` picks the embedding model (default
``nomic-embed-text``); the model must already be pulled on the server.
"""

from __future__ import annotations

import os

import pytest

OLLAMA_URL = os.environ.get("OLLAMA_URL")

pytestmark = [
    pytest.mark.external,
    pytest.mark.skipif(
        not OLLAMA_URL,
        reason="set OLLAMA_URL to run live-provider integration tests",
    ),
]


def test_live_ollama_catalog_fetch():
    from embeddingsearch_spark.sources.catalog import (
        ProviderConfig,
        fetch_model_catalog,
    )

    models = fetch_model_catalog(
        [
            ProviderConfig(
                name="live",
                kind="ollama",
                base_url=OLLAMA_URL,
                allowlist=(".*",),
            )
        ],
        timeout=10.0,
    )
    # same contract as the mocked test: provider-prefixed, allowlisted
    assert isinstance(models, list)
    assert all(m.startswith("live:") for m in models)


def test_live_ollama_embed_batch():
    from embeddingsearch_spark.sources.embedder import HttpEmbedder

    model = os.environ.get("OLLAMA_EMBED_MODEL", "nomic-embed-text")
    emb = HttpEmbedder(
        kind="ollama",
        url=OLLAMA_URL.rstrip("/") + "/api/embed",
        batch_size=2,
        timeout=30.0,
    )
    texts = ["hello world", "spark engine", "a third text"]
    out = emb.embed(texts, model)
    # the contract the mocked tests pin: one vector per input, all the
    # same dimension, all floats, batching transparent to the caller
    assert len(out) == len(texts)
    dims = {len(v) for v in out}
    assert len(dims) == 1 and dims.pop() > 0
    assert all(isinstance(x, float) for v in out for x in v)
    # identical input → identical embedding within one server session
    again = emb.embed(["hello world"], model)
    assert len(again) == 1 and len(again[0]) == len(out[0])
