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


def test_mixture_weights_temperature(spark):
    from embeddingsearch_spark.operators.splits import (
        mixture_weights_temperature,
    )

    df = spark.createDataFrame(
        [(i, "big") for i in range(90)] + [(90 + i, "small") for i in range(10)],
        "doc_id long, source string",
    )
    out = {
        r["source"]: r
        for r in mixture_weights_temperature(df, "source", alpha=0.5).collect()
    }
    zb, zs = 90 ** 0.5, 10 ** 0.5
    z = zb + zs
    assert out["big"]["weight"] == pytest.approx(zb / z)
    assert out["small"]["weight"] == pytest.approx(zs / z)
    # temperature boosts the small source above natural proportion
    assert out["small"]["weight"] > 0.10
    assert out["small"]["upsample_factor"] == pytest.approx(zs / z * 100 / 10)
    # alpha=1 -> natural proportions, every upsample factor exactly 1
    nat = {
        r["source"]: r
        for r in mixture_weights_temperature(df, "source", alpha=1.0).collect()
    }
    assert nat["big"]["upsample_factor"] == pytest.approx(1.0)
    assert nat["small"]["upsample_factor"] == pytest.approx(1.0)
