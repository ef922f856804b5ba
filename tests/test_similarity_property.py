"""Property-based parity: similarity kernels vs the NumPy oracle over
arbitrary float vectors (batched: one Spark job per hypothesis example)."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from embeddingsearch_spark.functions import similarity as S
from tests import numpy_oracle as NP

KERNELS = {
    "Cosine": NP.cosine,
    "Euclidian": NP.euclidian,
    "Manhattan": NP.manhattan,
    "Pearson": NP.pearson,
}

component = st.floats(min_value=-10.0, max_value=10.0, allow_nan=False)
pairs_strategy = st.lists(
    st.integers(min_value=1, max_value=16).flatmap(
        lambda d: st.tuples(
            st.lists(component, min_size=d, max_size=d),
            st.lists(component, min_size=d, max_size=d),
        )
    ),
    min_size=1,
    max_size=10,
)


@pytest.mark.slow
@given(pairs=pairs_strategy)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_all_kernels_match_numpy_oracle(spark, pairs):
    rows = [(i, a, b) for i, (a, b) in enumerate(pairs)]
    df = spark.createDataFrame(
        rows, "i long, a array<double>, b array<double>"
    )
    sel = [
        fn(F.col("a"), F.col("b")).alias(name)
        for name, fn in S.KERNELS.items()
    ]
    got = {r["i"]: r for r in df.select("i", *sel).collect()}
    for i, (a, b) in enumerate(pairs):
        for name, oracle_fn in KERNELS.items():
            expected = oracle_fn(a, b)
            actual = got[i][name]
            assert actual == pytest.approx(expected, rel=1e-9, abs=1e-9), (
                name,
                a,
                b,
                actual,
                expected,
            )
