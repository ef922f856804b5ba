"""Incremental query-results maintenance: repairing rankings by
re-scoring only touched entities must equal a full recompute."""

from __future__ import annotations

from pyspark.sql import functions as F

from embeddingsearch_spark import tables
from embeddingsearch_spark.operators import query_cache

SF = "/root/testdata/sf0.001"


def _touched():
    return F.expr("CAST(substring(entity, 5) AS BIGINT) % 3 = 1")


def test_incremental_equals_full_recompute(spark):
    corpus = tables.derive_corpus(spark, SF)
    queries = tables.derive_queries(spark, SF)
    materialized = query_cache.materialize(corpus, queries)

    updated = corpus.withColumn(
        "simmethod",
        F.when(_touched(), F.lit("Manhattan")).otherwise(F.col("simmethod")),
    )
    touched = updated.filter(_touched()).select("searchdomain", "entity")

    incremental = query_cache.incremental_refresh(
        materialized, updated, queries, touched
    )
    full = query_cache.materialize(updated, queries)
    assert sorted(map(tuple, incremental.collect())) == sorted(
        map(tuple, full.collect())
    )


def test_read_results_topn_over_full_ranking(spark):
    corpus = tables.derive_corpus(spark, SF)
    queries = tables.derive_queries(spark, SF)
    qr = query_cache.materialize(corpus, queries)
    top3 = query_cache.read_results(qr, query="q0", topn=3)
    rows = top3.collect()
    per_domain = {}
    for r in rows:
        per_domain.setdefault(r.searchdomain, []).append(r.rank)
    for ranks in per_domain.values():
        assert sorted(ranks) == [1, 2, 3]
