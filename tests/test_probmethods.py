"""Golden tests: probmethod aggregates vs the NumPy oracle, including the
FIXTURES.md §2 Q8 fixed lists and the exact-0/exact-1 short-circuits."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from embeddingsearch_spark.functions import probmethods as P
from tests import numpy_oracle as NP

RNG = np.random.default_rng(7)

# (group_name, values) — FIXTURES.md Q8 lists plus adversarial ones.
GROUPS = {
    "single_zero": [0.0],
    "single_one": [1.0],
    "zero_one": [0.0, 1.0],
    "halves": [0.5, 0.5],
    "plain": [0.2, 0.4, 0.9],
    "near_one": [1.0 - 1e-12, 0.5],  # within EPS of 1 → short-circuit
    "near_zero": [1e-12, 0.5],  # within EPS of 0
    "negatives": [-0.5, 0.25, 0.8],  # pearson-range inputs
    "neg_pair": [-0.5, -0.25],
    "uniform": list(RNG.uniform(0.01, 0.99, size=16)),
}

KEYS = {name: [f"k{i}" for i in range(len(vals))] for name, vals in GROUPS.items()}
DWA_WEIGHTS = {"k0": 2.0, "k1": 0.5}  # others default 1.0


def _df(spark):
    rows = [
        (g, KEYS[g][i], float(v))
        for g, vals in GROUPS.items()
        for i, v in enumerate(vals)
    ]
    return spark.createDataFrame(rows, "g string, k string, x double")


@pytest.mark.parametrize("method", list(NP.PROBMETHODS))
def test_probmethod_matches_numpy(spark, method):
    df = _df(spark)
    if method == "DictionaryWeightedAverage":
        import json

        mcol = F.lit("DictionaryWeightedAverage:" + json.dumps(DWA_WEIGHTS))
        w = P.dwa_weight(mcol, F.col("k"))
        agg = P.probmethod_agg(method, F.col("x"), w)
    else:
        agg = P.probmethod_agg(method, F.col("x"))
    got = {r["g"]: r["s"] for r in df.groupBy("g").agg(agg.alias("s")).collect()}
    for g, vals in GROUPS.items():
        want = NP.PROBMETHODS[method](vals, keys=KEYS[g], weights=DWA_WEIGHTS)
        assert got[g] == pytest.approx(want, rel=1e-9, abs=1e-12), (method, g)


def test_dispatch_agg(spark):
    """Per-group method dispatch picks the right fold, params included."""
    df = _df(spark).withColumn(
        "m",
        F.when(F.col("g") == "plain", "HarmonicMean")
        .when(F.col("g") == "halves", "QuadraticMean")
        .otherwise("Mean"),
    )
    w = P.dwa_weight(F.col("m"), F.col("k"))
    got = {
        r["g"]: r["s"]
        for r in df.withColumn("w", w)
        .groupBy("g", "m")
        .agg(
            P.probmethod_dispatch_agg(F.col("x"), F.col("m"), F.col("w")).alias("s")
        )
        .collect()
    }
    assert got["plain"] == pytest.approx(NP.harmonic_mean(GROUPS["plain"]))
    assert got["halves"] == pytest.approx(NP.quadratic_mean(GROUPS["halves"]))
    assert got["uniform"] == pytest.approx(NP.mean(GROUPS["uniform"]))


def test_dwa_weight_parsing(spark):
    df = spark.createDataFrame(
        [
            ('DictionaryWeightedAverage:{"a":3.5}', "a"),
            ('DictionaryWeightedAverage:{"a":3.5}', "b"),
            ("Mean", "a"),
        ],
        "m string, k string",
    )
    got = [
        r["w"]
        for r in df.select(P.dwa_weight(F.col("m"), F.col("k")).alias("w")).collect()
    ]
    assert got == [3.5, 1.0, 1.0]
