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


def quantize_scale(vec: Column) -> Column:
    """Per-vector int8 scale: max|x| / 127. Materialize this as its own
    column and pass it to ``quantize_int8`` — an inlined scale is
    re-evaluated per element inside the transform lambda (O(d) work per
    element → O(d²) per vector)."""
    return (
        F.array_max(F.transform(as_double(vec), lambda x: F.abs(x)))
        / F.lit(127.0)
    ).cast("double")


def quantize_int8(
    vec: Column, scale: Column | None = None
) -> tuple[Column, Column]:
    """Symmetric per-vector int8 quantization: scale = max|x| / 127,
    q = round(x / scale) — a 4x smaller embedding store (plus int8 GEMM
    downstream). Pure Catalyst HOFs, scan-stage; engine-reproducible
    (float->double promotion is exact, and round-half-away agrees between
    Spark HALF_UP and DuckDB). Returns (q: array<int>, scale: double);
    all-zero vectors quantize to zeros with scale 0.

    Pass ``scale`` as a MATERIALIZED column (see ``quantize_scale``) on
    the hot path: the self-contained form inlines the O(d) max into the
    per-element lambda, costing O(d²) per vector."""
    v = as_double(vec)
    if scale is None:
        scale = quantize_scale(vec)
    q = F.when(
        scale == 0.0, F.transform(v, lambda x: F.lit(0))
    ).otherwise(
        F.transform(v, lambda x: F.round(x / scale).cast("int"))
    )
    return q, scale


def dequantize_int8(q: Column, scale: Column) -> Column:
    """Inverse of quantize_int8 (lossy: max abs error <= scale / 2)."""
    return F.transform(q, lambda x: x.cast("double") * scale)
