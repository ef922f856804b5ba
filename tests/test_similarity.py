"""Golden tests: similarity kernels vs the NumPy oracle (SURVEY.md §5
plan item 1)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from embeddingsearch_spark.functions import similarity as S
from tests import numpy_oracle as NP

RNG = np.random.default_rng(42)

CASES = [
    ("basic", RNG.normal(size=8), RNG.normal(size=8)),
    ("identical", np.ones(6), np.ones(6)),
    ("opposite", np.ones(4), -np.ones(4)),
    ("orthogonal", np.array([1.0, 0, 0, 0]), np.array([0, 1.0, 0, 0])),
    ("zero_a", np.zeros(4), RNG.normal(size=4)),
    ("constant", np.full(5, 3.0), RNG.normal(size=5)),
    ("tiny", RNG.normal(size=3) * 1e-6, RNG.normal(size=3) * 1e-6),
    ("big_dim", RNG.normal(size=256), RNG.normal(size=256)),
]


def _pairs_df(spark):
    rows = [
        (name, [float(x) for x in a], [float(x) for x in b])
        for name, a, b in CASES
    ]
    return spark.createDataFrame(
        rows, "name string, a array<double>, b array<double>"
    )


@pytest.mark.parametrize("kernel", ["Cosine", "Euclidian", "Manhattan", "Pearson"])
def test_kernel_matches_numpy(spark, kernel):
    df = _pairs_df(spark)
    fn = S.KERNELS[kernel]
    got = {
        r["name"]: r["sim"]
        for r in df.select("name", fn(F.col("a"), F.col("b")).alias("sim")).collect()
    }
    for name, a, b in CASES:
        want = NP.KERNELS[kernel](a, b)
        assert got[name] == pytest.approx(want, abs=1e-12), (kernel, name)


def test_dispatch_selects_right_kernel(spark):
    df = _pairs_df(spark).withColumn(
        "m",
        F.when(F.col("name") == "basic", "Manhattan").otherwise("Cosine"),
    )
    got = {
        r["name"]: r["sim"]
        for r in df.select(
            "name",
            S.similarity_dispatch(F.col("m"), F.col("a"), F.col("b")).alias("sim"),
        ).collect()
    }
    a, b = CASES[0][1], CASES[0][2]
    assert got["basic"] == pytest.approx(NP.manhattan(a, b), abs=1e-12)
    assert got["identical"] == pytest.approx(1.0, abs=1e-12)


def test_cosine_range_and_remap(spark):
    """Cosine is remapped to [0,1]; identical vectors → exactly 1."""
    df = _pairs_df(spark)
    rows = df.select(
        "name", S.cosine(F.col("a"), F.col("b")).alias("c")
    ).collect()
    for r in rows:
        assert -1e-12 <= r["c"] <= 1.0 + 1e-12
    got = {r["name"]: r["c"] for r in rows}
    assert got["identical"] == pytest.approx(1.0)
    assert got["opposite"] == pytest.approx(0.0, abs=1e-12)
    assert got["zero_a"] == pytest.approx(0.5)  # declared zero-norm semantics
