"""Similarity kernels A1-A4 (reference SimilarityMethods.cs:55-113) as
Catalyst Column expressions over two array columns.

All four return float64. Ranges (declared semantics, constants.py):
  Cosine    — (cos+1)/2 remapped to [0,1]; zero-norm input → 0.5
              (reference: NaN — documented deviation).
  Euclidian — 1/(1+sqrt(Σd²)) ∈ (0,1]   (RationalRemap, :106-113)
  Manhattan — 1/(1+Σ|d|)      ∈ (0,1]
  Pearson   — raw correlation in [-1,1], NOT remapped (reference quirk kept,
              :88-104); zero OR underflowing variance → 0 (denormal inputs
              can drive the variance product to ≤0 in float64; a NaN score
              would poison orderBy ranking, so the denominator is guarded).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from embeddingsearch_spark.functions.vectors import (
    dot,
    l1_distance,
    l2_distance,
    sum_arr,
)


def cosine(a: Column, b: Column) -> Column:
    denom = F.sqrt(dot(a, a)) * F.sqrt(dot(b, b))
    raw = F.when(denom == 0.0, F.lit(0.0)).otherwise(dot(a, b) / denom)
    return (raw + 1.0) / 2.0


def euclidian(a: Column, b: Column) -> Column:
    return 1.0 / (1.0 + l2_distance(a, b))


def manhattan(a: Column, b: Column) -> Column:
    return 1.0 / (1.0 + l1_distance(a, b))


def pearson(a: Column, b: Column) -> Column:
    n = F.size(a).cast("double")
    s1, s2 = sum_arr(a), sum_arr(b)
    s11 = dot(a, a)
    s22 = dot(b, b)
    s12 = dot(a, b)
    num = s12 - s1 * s2 / n
    # Guard the variance product, not just den == 0: denormal inputs
    # (e.g. [-1.175e-38, …]) underflow the variance to a tiny negative,
    # sqrt goes NaN, and the NaN would poison downstream orderBy.
    varprod = (s11 - s1 * s1 / n) * (s22 - s2 * s2 / n)
    den = F.sqrt(varprod)
    return F.when(
        (varprod <= 0.0) | F.isnan(den), F.lit(0.0)
    ).otherwise(num / den)


KERNELS = {
    "Cosine": cosine,
    "Euclidian": euclidian,
    "Manhattan": manhattan,
    "Pearson": pearson,
}


def similarity_dispatch(method: Column, a: Column, b: Column) -> Column:
    """Per-row simmethod dispatch (reference Datapoint.cs:10-11 — datapoints
    in one entity may use different similarity methods, so dispatch must be
    per row, not per query; SURVEY.md §7 risk 4)."""
    expr = F.lit(None).cast("double")
    for name, fn in KERNELS.items():
        expr = F.when(method == name, fn(a, b)).otherwise(expr)
    return expr
