"""HTTP model-catalog fetch (S7, reference AIProvider.GetModels,
AIProvider.cs:135-216) with a mocked GET transport: wire formats, auth
header, provider-name prefixing, and the reference's allow/deny
semantics including the empty-allowlist-admits-nothing quirk."""

from __future__ import annotations

import pytest

from embeddingsearch_spark.sources.catalog import (
    ProviderConfig,
    catalog_df,
    fetch_model_catalog,
)

OLLAMA = {"models": [{"name": "llama3"}, {"name": "nomic-embed"},
                     {"name": "llama2-old"}, {}]}
OPENAI = {"data": [{"id": "text-embedding-3-small"}, {"id": "gpt-old"}, {}]}


def _transport(calls):
    def get(url, headers, timeout):
        calls.append({"url": url, "headers": headers})
        return OLLAMA if "/api/tags" in url else OPENAI

    return get


def test_wire_formats_auth_and_prefixing():
    calls = []
    providers = [
        ProviderConfig("local", "ollama", "http://h1:11434/",
                       allowlist=(".*",)),
        ProviderConfig("oai", "openai", "http://h2", api_key="sk-x",
                       allowlist=("^text-",)),
    ]
    got = fetch_model_catalog(providers, transport=_transport(calls))
    assert calls[0]["url"] == "http://h1:11434/api/tags"
    assert calls[0]["headers"] == {}
    assert calls[1]["url"] == "http://h2/v1/models"
    assert calls[1]["headers"] == {"Authorization": "Bearer sk-x"}
    # null entries skipped; provider-name prefix applied; provider order
    assert got == [
        "local:llama3",
        "local:nomic-embed",
        "local:llama2-old",
        "oai:text-embedding-3-small",
    ]


def test_allow_deny_semantics():
    providers = [
        ProviderConfig(
            "p", "ollama", "http://h",
            allowlist=("^llama", "embed"), denylist=("-old$",),
        )
    ]
    got = fetch_model_catalog(providers, transport=_transport([]))
    assert got == ["p:llama3", "p:nomic-embed"]  # llama2-old denied


def test_empty_allowlist_admits_nothing():
    # AIProvider.cs ElementMatchesAnyRegexInList: null list -> false, so
    # no allowlist means NO models pass — the reference's quirk, kept.
    providers = [ProviderConfig("p", "ollama", "http://h")]
    assert fetch_model_catalog(providers, transport=_transport([])) == []


def test_unknown_handler_raises():
    with pytest.raises(ValueError, match="Unknown handler"):
        fetch_model_catalog(
            [ProviderConfig("p", "azure", "http://h")],
            transport=_transport([]),
        )


def test_catalog_df_feeds_rlike_filter(spark):
    from pyspark.sql import functions as F

    providers = [
        ProviderConfig("mock", "ollama", "http://h", allowlist=(".*",)),
    ]
    df = catalog_df(spark, providers, transport=_transport([]))
    kept = (
        df.filter(F.col("model").rlike("^mock:"))
        .filter(~F.col("model").rlike("-old$"))
        .collect()
    )
    assert sorted(r["model"] for r in kept) == [
        "mock:llama3",
        "mock:nomic-embed",
    ]
