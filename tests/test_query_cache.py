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


def test_serve_bm25_cached_hit_miss_and_version(spark):
    """Persisted query cache: a second serve answers cached queries
    from the table (no new rows appended for them), results always
    equal the direct computation, and bumping index_version makes old
    entries unreachable."""
    from pyspark.sql import functions as F

    from embeddingsearch_spark.operators import retrieval
    from embeddingsearch_spark.operators.query_cache import (
        serve_bm25_cached,
    )
    from embeddingsearch_spark.storage import drop_table

    drop_table(spark, "es_test_query_cache")
    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),
            (2, "the dog sat on the log"),
            (3, "cats and dogs living together"),
        ],
        "doc_id long, text string",
    )
    qs = spark.createDataFrame(
        [(100, "the cat"), (101, "dog"), (102, "zzz_nomatch"),
         (103, "the cat")],  # duplicate text of 100
        "query_id long, text string",
    )

    def direct(q):
        return sorted(
            tuple(r)
            for r in retrieval.bm25_topk(docs, q, k=10).collect()
        )

    first = serve_bm25_cached(
        spark, "es_test_query_cache", docs,
        qs.filter(F.col("query_id") <= 100), "v1", k=10,
    )
    assert sorted(tuple(r) for r in first.collect()) == direct(
        qs.filter(F.col("query_id") <= 100)
    )
    n_cached = spark.table("es_test_query_cache").count()
    second = serve_bm25_cached(
        spark, "es_test_query_cache", docs, qs, "v1", k=10
    )
    assert sorted(tuple(r) for r in second.collect()) == direct(qs)
    # 103 duplicates 100's text -> served from cache; only 101's
    # ranking was appended (102 matches nothing, nothing to store)
    appended = spark.table("es_test_query_cache").count() - n_cached
    assert appended == retrieval.bm25_topk(
        docs, qs.filter(F.col("query_id") == 101), k=10
    ).count()
    # version bump: everything recomputes, results unchanged
    third = serve_bm25_cached(
        spark, "es_test_query_cache", docs, qs, "v2", k=10
    )
    assert sorted(tuple(r) for r in third.collect()) == direct(qs)
