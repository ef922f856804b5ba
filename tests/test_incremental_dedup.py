"""Batch-ingest dedup gate (`dedup.incremental_new_docs`)."""

from __future__ import annotations

from embeddingsearch_spark.operators import dedup as dd


def test_incremental_new_docs_filters_known_content(spark):
    indexed = spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma delta")], "doc_id long, text string"
    )
    incoming = spark.createDataFrame(
        [
            (10, "alpha beta"),        # exact known content → dropped
            (11, "Alpha   BETA "),     # same after normalization → dropped
            (12, "epsilon zeta"),      # new → kept
        ],
        "doc_id long, text string",
    )
    out = dd.incremental_new_docs(incoming, indexed, "doc_id", "text")
    assert [r["doc_id"] for r in out.collect()] == [12]


def test_incremental_self_empty(spark):
    df = spark.createDataFrame([(1, "x"), (2, "y")], "doc_id long, text string")
    assert dd.incremental_new_docs(df, df, "doc_id", "text").count() == 0
