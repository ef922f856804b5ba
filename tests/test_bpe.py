"""BPE pair-frequency statistics (operators/bpe.py): the Sennrich et al.
2016 worked example — word histogram {low:5, lower:2, newest:6, widest:3}
makes ('e','s') the first merge with count 9."""

from __future__ import annotations

from pyspark.sql import functions as F

from embeddingsearch_spark.operators import bpe


def _corpus(spark):
    words = ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    return spark.createDataFrame(
        [(0, " ".join(words[:8])), (1, " ".join(words[8:]))],
        "doc_id long, text string",
    )


def test_word_histogram(spark):
    hist = {
        r["word"]: r["n"]
        for r in bpe.word_histogram(_corpus(spark)).collect()
    }
    assert hist == {"low": 5, "lower": 2, "newest": 6, "widest": 3}


def test_pair_counts_and_first_merge(spark):
    pc = bpe.bpe_pair_counts(_corpus(spark))
    counts = {(r["a"], r["b"]): r["n_pairs"] for r in pc.collect()}
    # 'es' appears in newest(6) + widest(3); 'lo' in low(5) + lower(2)
    assert counts[("e", "s")] == 9
    assert counts[("s", "t")] == 9
    assert counts[("t", "</w>")] == 9
    assert counts[("l", "o")] == 7
    assert counts[("w", "</w>")] == 5  # low's closing pair only
    top = bpe.bpe_top_merges(pc, n_merges=3).collect()
    # count desc, then (a, b) asc: (e,s) < (s,t) < (t,</w>)
    assert [(r["a"], r["b"], r["rank"]) for r in top] == [
        ("e", "s", 1),
        ("s", "t", 2),
        ("t", "</w>", 3),
    ]


def test_end_marker_and_case(spark):
    df = spark.createDataFrame([(0, "Ab ab")], "doc_id long, text string")
    pc = {
        (r["a"], r["b"]): r["n_pairs"]
        for r in bpe.bpe_pair_counts(df).collect()
    }
    assert pc == {("a", "b"): 2, ("b", "</w>"): 2}  # lowercased, closed
    pc_cased = {
        (r["a"], r["b"]): r["n_pairs"]
        for r in bpe.bpe_pair_counts(df, lowercase=False).collect()
    }
    assert pc_cased[("A", "b")] == 1 and pc_cased[("a", "b")] == 1


def test_bpe_apply_words(spark):
    from embeddingsearch_spark.operators.bpe import bpe_apply_words

    words = spark.createDataFrame(
        [("low",), ("lower",), ("newest",), ("a",)], "word string"
    )
    merges = spark.createDataFrame(
        [("l", "o", 1), ("lo", "w", 2), ("e", "s", 3), ("es", "t", 4)],
        "a string, b string, rank int",
    )
    out = {r["word"]: r for r in bpe_apply_words(words, merges).collect()}
    # low: l o w </w> -> lo w </w> -> low </w>
    assert out["low"]["pieces"] == "low </w>"
    assert out["low"]["n_pieces"] == 2
    # lower: lo w e r </w> -> low e r </w> (no (e,r) merge)
    assert out["lower"]["pieces"] == "low e r </w>"
    # newest: n e w es t </w> -> n e w est </w>
    assert out["newest"]["pieces"] == "n e w est </w>"
    assert out["a"]["pieces"] == "a </w>"


def test_bpe_apply_rank_order_not_count_order(spark):
    from embeddingsearch_spark.operators.bpe import bpe_apply_words

    # (e,y) outranked by (k,e): 'key' must merge k+e first, leaving y
    words = spark.createDataFrame([("key",)], "word string")
    merges = spark.createDataFrame(
        [("k", "e", 1), ("e", "y", 2)], "a string, b string, rank int"
    )
    out = bpe_apply_words(words, merges).collect()[0]
    assert out["pieces"] == "ke y </w>"


def test_bpe_encode_docs_counts(spark):
    from embeddingsearch_spark.operators.bpe import (
        bpe_encode_docs,
        bpe_pair_counts,
        bpe_top_merges,
    )

    docs = spark.createDataFrame(
        [(1, "aa aa bb"), (2, "aa"), (3, "")],
        "doc_id long, text string",
    )
    merges = bpe_top_merges(bpe_pair_counts(docs), n_merges=2)
    out = {r["doc_id"]: r for r in bpe_encode_docs(docs, merges).collect()}
    assert 3 not in out  # empty doc has no words
    assert out[1]["n_words"] == 3
    assert out[2]["n_words"] == 1
    # every word compresses at least to <= chars+1 pieces
    assert out[2]["n_bpe_pieces"] <= 3
