"""The suite registry contract: every gated query resolves, the bench
build/serve classification is validated suite metadata (round-6 ADVICE
#4), and a mistagged name fails loudly."""

from __future__ import annotations

import pytest


def test_build_query_names_validated_against_registry():
    from embeddingsearch_spark.suite import all_queries, build_query_names

    build = build_query_names()
    q = all_queries()
    assert build <= set(q)
    # every build family keeps a serving-shaped twin in the headline
    serve = set(q) - build
    for twin in (
        "graph_ann_persisted", "unified_index_serve", "hybrid_rrf",
        "bm25_tenant_serve", "bm25_tenant_cached_serve",
        "pq_tenant_serve", "bm25_lang_routed",
    ):
        assert twin in serve, twin


def test_mistagged_build_query_raises(monkeypatch):
    from embeddingsearch_spark.suite import ann, build_query_names

    monkeypatch.setattr(
        ann, "BUILD_QUERIES", ann.BUILD_QUERIES | {"renamed_away"}
    )
    with pytest.raises(ValueError, match="renamed_away"):
        build_query_names()
