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
