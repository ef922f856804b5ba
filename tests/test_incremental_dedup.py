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


def test_remove_duplicate_spans(spark):
    from embeddingsearch_spark.operators.dedup import remove_duplicate_spans

    docs = spark.createDataFrame(
        [
            (1, "a b c d e f g h x y z"),  # canonical owner of a..h
            (2, "p q a b c d e f g h r"),  # dup occurrence -> 8 tokens cut
            (3, "m n o"),                  # shorter than n: untouched
            (4, ""),                       # empty doc survives as ''
            (5, "a b c d e f g h a b c d e f g h"),  # both non-canonical
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r for r in remove_duplicate_spans(docs, n=8).collect()
    }
    assert len(out) == 5  # every input doc present
    assert out[1]["n_removed"] == 0
    assert out[1]["text_clean"] == "a b c d e f g h x y z"
    assert out[2]["n_removed"] == 8 and out[2]["text_clean"] == "p q r"
    assert out[3]["n_removed"] == 0
    assert out[4]["n_tokens"] == 0 and out[4]["text_clean"] == ""
    # doc 1 holds the canonical occurrence, so BOTH of doc 5's copies cut
    assert out[5]["n_removed"] == 16 and out[5]["text_clean"] == ""


def test_remove_duplicate_spans_overlap_merge(spark):
    from embeddingsearch_spark.operators.dedup import remove_duplicate_spans

    # doc 2 repeats a 9-token run of doc 1: two overlapping 8-gram cuts
    # [1,8] and [2,9] merge into one island of 9 tokens.
    docs = spark.createDataFrame(
        [
            (1, "a b c d e f g h i z z2 z3"),
            (2, "a b c d e f g h i w"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r for r in remove_duplicate_spans(docs, n=8).collect()
    }
    assert out[1]["n_removed"] == 0
    assert out[2]["n_removed"] == 9 and out[2]["text_clean"] == "w"
