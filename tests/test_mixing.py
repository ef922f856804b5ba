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


def test_unimax_allocation_waterfilling(spark):
    """Hand-computed: caps 20/200/2000 (E=2), budget 600 → A and B fully
    capped (2 epochs), C absorbs the remaining 380."""
    rows = (
        [(f"a{i}", "A") for i in range(10)]
        + [(f"b{i}", "B") for i in range(100)]
        + [(f"c{i}", "C") for i in range(1000)]
    )
    df = spark.createDataFrame(rows, "doc_id string, src string")
    out = {
        r["src"]: r
        for r in splits.unimax_allocation(
            df, "src", budget=600.0, max_epochs=2.0
        ).collect()
    }
    assert out["A"]["alloc"] == 20.0 and out["A"]["epochs"] == 2.0
    assert out["B"]["alloc"] == 200.0 and out["B"]["epochs"] == 2.0
    assert out["C"]["alloc"] == 380.0 and abs(out["C"]["epochs"] - 0.38) < 1e-12
    assert sum(r["alloc"] for r in out.values()) == 600.0


def test_unimax_budget_exceeds_caps(spark):
    """Budget above the total cap: every group fully capped, no NaNs."""
    rows = [("x", "A"), ("y", "B"), ("z", "B")]
    df = spark.createDataFrame(rows, "doc_id string, src string")
    out = {
        r["src"]: r
        for r in splits.unimax_allocation(
            df, "src", budget=1e9, max_epochs=3.0
        ).collect()
    }
    assert out["A"]["alloc"] == 3.0 and out["B"]["alloc"] == 6.0
    assert out["A"]["epochs"] == 3.0 and out["B"]["epochs"] == 3.0


def test_unimax_invariants_random_cases(spark):
    """Waterfilling invariants over randomized group sizes: the total
    allocation equals min(budget, total cap), every group respects its
    cap, and groups below the water level are fully capped."""
    import random

    rng = random.Random(11)
    for trial in range(3):
        sizes = {f"g{i}": rng.randint(1, 500) for i in range(6)}
        rows = [
            (f"{g}_{j}", g) for g, n in sizes.items() for j in range(n)
        ]
        total = sum(sizes.values())
        budget = float(rng.randint(1, 2 * total))
        e = 2.0
        df = spark.createDataFrame(rows, "doc_id string, src string")
        alloc = {
            r["src"]: r
            for r in splits.unimax_allocation(
                df, "src", budget=budget, max_epochs=e
            ).collect()
        }
        total_cap = sum(r["cap"] for r in alloc.values())
        got = sum(r["alloc"] for r in alloc.values())
        assert abs(got - min(budget, total_cap)) < 1e-6, (trial, got)
        for r in alloc.values():
            assert r["alloc"] <= r["cap"] + 1e-9
            assert r["epochs"] <= e + 1e-9
        # uncapped groups all share the same water level
        lvls = {
            round(r["alloc"], 6)
            for r in alloc.values()
            if r["alloc"] < r["cap"] - 1e-9
        }
        assert len(lvls) <= 1, lvls


def test_funnel_stats_single_job_accounting(spark):
    """Counts, drops, and percentages per stage; first stage drops 0."""
    from embeddingsearch_spark.operators import funnel

    s0 = spark.range(100).withColumnRenamed("id", "doc_id")
    s1 = s0.filter(F.col("doc_id") % 2 == 0)   # 50
    s2 = s1.filter(F.col("doc_id") % 10 == 0)  # 10
    out = {
        r["stage"]: r
        for r in funnel.funnel_stats(
            [("in", s0), ("even", s1), ("tens", s2)]
        ).collect()
    }
    assert out["in"]["n"] == 100 and out["in"]["n_dropped"] == 0
    assert out["even"]["n"] == 50 and out["even"]["n_dropped"] == 50
    assert out["even"]["drop_pct"] == 0.5
    assert out["tens"]["n"] == 10 and out["tens"]["drop_pct"] == 0.8


def test_funnel_stats_zero_row_stage_visible(spark):
    """A gate that drops everything still appears with n=0, and the
    next stage's delta is computed against it."""
    from embeddingsearch_spark.operators import funnel

    s0 = spark.range(10).withColumnRenamed("id", "doc_id")
    s1 = s0.filter(F.col("doc_id") < 0)  # kills everything
    s2 = s1
    rows = {
        r["stage"]: r
        for r in funnel.funnel_stats(
            [("in", s0), ("gate", s1), ("after", s2)]
        ).collect()
    }
    assert rows["gate"]["n"] == 0 and rows["gate"]["n_dropped"] == 10
    assert rows["gate"]["drop_pct"] == 1.0
    assert rows["after"]["n"] == 0 and rows["after"]["n_dropped"] == 0
