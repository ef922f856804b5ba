"""int8 embedding quantization (functions/vectors.py): round-trip error
bound, zero-vector handling, range clamp-free correctness."""

from __future__ import annotations

from pyspark.sql import functions as F

from embeddingsearch_spark.functions import vectors


def _roundtrip(spark, vec):
    df = spark.createDataFrame([(vec,)], "v array<float>")
    q, scale = vectors.quantize_int8(F.col("v"))
    row = df.select(
        q.alias("q"), scale.alias("s"),
        vectors.as_double(F.col("v")).alias("vd"),
    ).first()
    return row["q"], row["s"], row["vd"]


def test_roundtrip_error_bound(spark):
    vec = [0.11, -0.52, 0.0031, 0.77, -0.77, 0.249]
    q, s, vd = _roundtrip(spark, vec)
    assert all(-127 <= x <= 127 for x in q)
    assert max(abs(x) for x in vd) / 127.0 == s
    for qi, vi in zip(q, vd):
        assert abs(qi * s - vi) <= s / 2 + 1e-12
    # the max-magnitude element hits exactly +-127
    assert 127 in q or -127 in q


def test_zero_vector(spark):
    q, s, _ = _roundtrip(spark, [0.0, 0.0, 0.0])
    assert s == 0.0 and q == [0, 0, 0]


def test_dequantize_inverse(spark):
    df = spark.createDataFrame([([0.5, -1.0, 0.25],)], "v array<float>")
    q, scale = vectors.quantize_int8(F.col("v"))
    deq = vectors.dequantize_int8(q, scale)
    row = df.select(deq.alias("d"), vectors.as_double("v").alias("vd")).first()
    for d, v in zip(row["d"], row["vd"]):
        assert abs(d - v) <= abs(v) / 127.0 + 1e-12
