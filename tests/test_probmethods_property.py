"""Property-based parity: for arbitrary float groups, every probmethod's
Spark aggregate equals the NumPy oracle. Groups are batched into one
DataFrame per hypothesis example so each example costs one Spark job."""

from __future__ import annotations

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from embeddingsearch_spark.functions import probmethods as P
from tests import numpy_oracle as NP

METHODS = {
    "Mean": NP.mean,
    "HarmonicMean": NP.harmonic_mean,
    "QuadraticMean": NP.quadratic_mean,
    "GeometricMean": NP.geometric_mean,
    "EVEWAvg": NP.evew_avg,
    "HVEWAvg": NP.hvew_avg,
    "LVEWAvg": NP.lvew_avg,
}

# score-like floats: the similarity output range plus exact boundary hits
score = st.one_of(
    st.floats(min_value=-1.0, max_value=1.5, allow_nan=False),
    st.sampled_from([0.0, 1.0, 0.5, -1.0]),
)
groups_strategy = st.lists(
    st.lists(score, min_size=1, max_size=12), min_size=1, max_size=12
)


@pytest.mark.slow
@given(groups=groups_strategy)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_all_probmethods_match_numpy_oracle(spark, groups):
    rows = [
        (f"g{gi}", float(x)) for gi, xs in enumerate(groups) for x in xs
    ]
    df = spark.createDataFrame(rows, "g string, x double")
    aggs = [
        P.probmethod_agg(m, F.col("x"), F.lit(1.0)).alias(m)
        for m in METHODS
    ]
    got = {r["g"]: r for r in df.groupBy("g").agg(*aggs).collect()}
    for gi, xs in enumerate(groups):
        for m, oracle_fn in METHODS.items():
            expected = oracle_fn(xs)
            actual = got[f"g{gi}"][m]
            if expected is None or (
                isinstance(expected, float) and math.isnan(expected)
            ):
                assert actual is None or math.isnan(actual), (m, xs, actual)
            else:
                assert actual == pytest.approx(expected, rel=1e-9, abs=1e-9), (
                    m,
                    xs,
                    actual,
                    expected,
                )
