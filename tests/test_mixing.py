"""Stratified sampling and weighted corpus mixing (operators/splits.py):
determinism, expected-rate accuracy, and copy semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from embeddingsearch_spark.operators import splits


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [(i, "en" if i % 2 == 0 else "fr") for i in range(2000)]
    return spark.createDataFrame(rows, "id long, lang string").cache()


def test_stratified_rates_and_determinism(corpus):
    out = splits.stratified_sample(
        corpus, "id", "lang", {"en": 0.3, "fr": 1.0}
    )
    counts = {
        r["lang"]: r["n"]
        for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert counts["fr"] == 1000  # rate 1.0 keeps everything
    assert 240 <= counts["en"] <= 360  # 0.3 of 1000 within hash tolerance
    # repartitioning must not move the sample (the randomSplit failure mode)
    again = splits.stratified_sample(
        corpus.repartition(7), "id", "lang", {"en": 0.3, "fr": 1.0}
    )
    assert set(map(tuple, again.collect())) == set(map(tuple, out.collect()))


def test_stratified_default_rate_drops_unknown(corpus):
    out = splits.stratified_sample(corpus, "id", "lang", {"en": 1.0})
    assert out.filter(F.col("lang") == "fr").count() == 0


def test_weighted_mix_copies(corpus):
    out = splits.weighted_mix(
        corpus, "id", "lang", {"en": 2.0, "fr": 0.5}
    )
    en = out.filter(F.col("lang") == "en")
    # integer weight → exactly w copies of every row, tagged 1..w
    assert en.count() == 2000
    assert set(r["copy"] for r in en.select("copy").distinct().collect()) == {1, 2}
    fr = out.filter(F.col("lang") == "fr").count()
    assert 400 <= fr <= 600
    # zero-weight strata vanish entirely (default_weight=0)
    assert out.filter(~F.col("lang").isin("en", "fr")).count() == 0


def test_weighted_mix_rejects_negative(corpus):
    with pytest.raises(ValueError):
        splits.weighted_mix(corpus, "id", "lang", {"en": -1.0})
