"""Corpus drift: JS divergence and embedding mean-shift known values."""

import math

from embeddingsearch_spark.operators.drift import (
    embedding_drift,
    vocab_drift,
)


def test_vocab_drift_identical_is_zero(spark):
    docs = spark.createDataFrame(
        [(i, "alpha beta gamma") for i in range(4)],
        "doc_id long, text string",
    )
    summary, per_token = vocab_drift(docs, docs, vocab_size=16)
    s = summary.collect()[0]
    assert s["js_divergence"] == 0.0
    for r in per_token.collect():
        assert r["p_a"] == r["p_b"] and r["log_ratio"] == 0.0


def test_vocab_drift_shifted_corpora(spark):
    a = spark.createDataFrame(
        [(1, "alpha alpha alpha beta")], "doc_id long, text string"
    )
    b = spark.createDataFrame(
        [(2, "beta beta beta gamma")], "doc_id long, text string"
    )
    summary, per_token = vocab_drift(a, b, vocab_size=16)
    s = summary.collect()[0]
    # JS is positive and bounded by ln 2
    assert 0.0 < s["js_divergence"] <= math.log(2) + 1e-9
    rows = {r["tok"]: r for r in per_token.collect()}
    # alpha over-represented in A, gamma in B
    assert rows["alpha"]["log_ratio"] > 0
    assert rows["gamma"]["log_ratio"] < 0
    # mirror one probability: p_a(alpha) = (3+1)/(4 + 17)
    assert abs(rows["alpha"]["p_a"] - round(4 / 21, 6)) < 1e-9


def test_embedding_drift_known_shift(spark):
    a = spark.createDataFrame(
        [(i, [1.0, 0.0, 2.0]) for i in range(3)],
        "vec_id long, embedding array<float>",
    )
    b = spark.createDataFrame(
        [(i, [1.0, 3.0, 2.0]) for i in range(2)],
        "vec_id long, embedding array<float>",
    )
    summary, per_dim = embedding_drift(a, b, top_dims=2)
    s = summary.collect()[0]
    assert abs(s["mean_shift_l2"] - 3.0) < 1e-9
    assert s["n_a"] == 3 and s["n_b"] == 2
    dims = [r["dim"] for r in per_dim.collect()]
    assert dims[0] == 1  # the shifted dimension ranks first
