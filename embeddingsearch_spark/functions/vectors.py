"""Array<numeric> → Column helpers built on Spark higher-order functions.

Everything here stays inside Catalyst/whole-stage-codegen (no Python UDFs):
`zip_with` + `aggregate` compile to JVM expressions, so the similarity hot
path is executed vectorized per row with no serialization boundary — the
Spark-native equivalent of the reference's SIMD TensorPrimitives use
(reference SimilarityMethods.cs:57).

All arithmetic is promoted to float64 (declared semantics, constants.py).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(arr: Column) -> Column:
    """Cast array<float|double|int> to array<double>."""
    return F.transform(arr, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ in float64, array-order deterministic."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm2(a: Column) -> Column:
    """L2 norm."""
    return F.sqrt(dot(a, a))


def sum_arr(a: Column) -> Column:
    return F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double"))


def l2_distance(a: Column, b: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.zip_with(
                a, b, lambda x, y: (x.cast("double") - y.cast("double")) ** 2
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )

def l1_distance(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(
            a, b, lambda x, y: F.abs(x.cast("double") - y.cast("double"))
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
