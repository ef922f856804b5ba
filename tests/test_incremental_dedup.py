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


def test_incremental_neardup_classifies_batch(spark):
    """Near-dup gate: exact re-delivery matches at jaccard 1.0, an edited
    copy matches fuzzily, fresh content is_new."""
    from embeddingsearch_spark.operators import dedup

    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    indexed = spark.createDataFrame(
        [(1, base), (2, "spark plans shuffle exchanges and codegen stages nightly")],
        "doc_id long, text string",
    )
    incoming = spark.createDataFrame(
        [
            (10, base),                             # exact
            (11, base + " with a tiny appended tail"),  # near
            (12, "completely unrelated fresh text about volcanoes erupting"),
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r
        for r in dedup.incremental_neardup(
            incoming, indexed, "doc_id", "text"
        ).collect()
    }
    assert len(out) == 3
    assert out[10].match_id == 1 and out[10].jaccard == 1.0
    assert out[11].match_id == 1 and 0.5 <= out[11].jaccard < 1.0
    assert out[12].is_new and out[12].match_id is None
    assert not out[10].is_new and not out[11].is_new


def test_incremental_neardup_exact_first_equivalent(spark):
    """exact_first short-circuits byte-identical dups but classifies the
    batch identically (no shingle-set collisions in this data)."""
    from embeddingsearch_spark.operators import dedup

    docs = [
        (i, f"document number {i} about topic {i % 3} with body text {i}")
        for i in range(40)
    ]
    indexed = spark.createDataFrame(docs, "doc_id long, text string")
    incoming = spark.createDataFrame(
        [(100 + i, t) for i, (_, t) in enumerate(docs[:10])]          # exact
        + [(200, docs[5][1] + " edited tail"), (300, "wholly new text here")],
        "doc_id long, text string",
    )
    kw = dict(id_col="doc_id", text_col="text")
    pure = {
        r.doc_id: (r.match_id, r.is_new)
        for r in dedup.incremental_neardup(incoming, indexed, **kw).collect()
    }
    fast = {
        r.doc_id: (r.match_id, r.is_new)
        for r in dedup.incremental_neardup(
            incoming, indexed, exact_first=True, **kw
        ).collect()
    }
    assert pure == fast
    assert fast[300] == (None, True)
    assert fast[100] == (0, False)
