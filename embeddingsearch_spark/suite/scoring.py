"""Scoring-pipeline queries: the flagship cascade (SURVEY.md §2.4 A13) and
its topN variant, over the derived reference-shaped fixture."""

from __future__ import annotations

from embeddingsearch_spark import oracle, tables
from embeddingsearch_spark.operators import search as search_op


def q_search_cascade(spark, sf_dir):
    corpus = tables.derive_corpus(spark, sf_dir)
    queries = tables.derive_queries(spark, sf_dir)
    return search_op.search(corpus, queries)


def q_search_top5(spark, sf_dir):
    corpus = tables.derive_corpus(spark, sf_dir)
    queries = tables.derive_queries(spark, sf_dir)
    return search_op.search(corpus, queries, topn=5)


QUERIES = {
    "search_cascade": (q_search_cascade, oracle.search_cascade_sql()),
    "search_top5": (q_search_top5, oracle.search_cascade_sql(topn=5)),
}
