"""Phrase PMI and fixed-N stratified sampling."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from embeddingsearch_spark.operators import phrases, splits


def test_phrase_pmi_ranks_collocation_above_chance(spark):
    # "machine learning" always adjacent; "the" everywhere (low PMI)
    docs = spark.createDataFrame(
        [
            (i, "the machine learning model beats the baseline model")
            for i in range(10)
        ],
        "doc_id long, text string",
    )
    out = {
        (r.w1, r.w2): r
        for r in phrases.phrase_scores(docs, "text", min_count=5).collect()
    }
    ml = out[("machine", "learning")]
    assert ml.n_pair == 10 and ml.n_w1 == 10 and ml.n_w2 == 10
    # exact PMI: ln((10/70) / ((10/80)*(10/80))) — 80 tokens, 70 bigrams
    assert ml.pmi == round(math.log((10 / 70) / ((10 / 80) * (10 / 80))), 6)
    # "the X" pairs exist but score far lower than the true collocation
    the_pairs = [r.pmi for (w1, _), r in out.items() if w1 == "the"]
    assert the_pairs and max(the_pairs) < ml.pmi


def test_phrase_min_count_cut(spark):
    docs = spark.createDataFrame(
        [(0, "rare bigram here"), (1, "common pair common pair common pair")],
        "doc_id long, text string",
    )
    out = phrases.phrase_scores(docs, "text", min_count=3).collect()
    pairs = {(r.w1, r.w2) for r in out}
    assert ("rare", "bigram") not in pairs
    assert ("common", "pair") in pairs


def test_stratified_fixed_n_exact_and_deterministic(spark):
    df = spark.createDataFrame(
        [(i, "ab"[i % 2]) for i in range(100)], "id long, g string"
    )
    s1 = splits.stratified_fixed_n(df, "id", "g", 7)
    s2 = splits.stratified_fixed_n(df, "id", "g", 7)
    r1 = sorted((r.g, r.id) for r in s1.collect())
    assert r1 == sorted((r.g, r.id) for r in s2.collect())
    counts = {
        r.g: r.n
        for r in s1.groupBy("g").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert counts == {"a": 7, "b": 7}
    # a different salt draws a different sample
    s3 = splits.stratified_fixed_n(df, "id", "g", 7, salt="other")
    assert sorted((r.g, r.id) for r in s3.collect()) != r1


def test_stratified_fixed_n_small_stratum(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b")], "id long, g string"
    )
    out = splits.stratified_fixed_n(df, "id", "g", 10)
    assert out.count() == 3  # strata smaller than N pass through whole
