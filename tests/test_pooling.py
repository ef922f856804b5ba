"""Chunk→doc embedding pooling."""

from __future__ import annotations

from pyspark.sql import functions as F

from embeddingsearch_spark.operators import pooling
from embeddingsearch_spark.plans import inspect as pi


def test_mean_pool(spark):
    rows = [
        (1, [1.0, 2.0]),
        (1, [3.0, 4.0]),
        (2, [5.0, 6.0]),
    ]
    df = spark.createDataFrame(rows, "doc_id long, vec array<double>")
    out = {
        r["doc_id"]: r
        for r in pooling.mean_pool(df, "doc_id", "vec").collect()
    }
    assert out[1]["pooled"] == [2.0, 3.0] and out[1]["n_chunks"] == 2
    assert out[2]["pooled"] == [5.0, 6.0] and out[2]["n_chunks"] == 1


def test_weighted_mean_pool(spark):
    rows = [
        (1, [1.0, 0.0], 1.0),
        (1, [4.0, 2.0], 3.0),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, vec array<double>, w double"
    )
    out = pooling.mean_pool(df, "doc_id", "vec", weight_col="w").collect()[0]
    # (1*1 + 3*4)/4 = 3.25 ; (1*0 + 3*2)/4 = 1.5
    assert out["pooled"] == [3.25, 1.5]


def test_mean_pool_single_shuffle(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 2.0])], "doc_id long, vec array<double>"
    )
    assert pi.count_shuffles(pooling.mean_pool(df, "doc_id", "vec")) == 1


def test_mean_pool_float_input_cast(spark):
    df = spark.range(4).select(
        (F.col("id") % 2).alias("doc_id"),
        F.array(F.lit(1.5), F.lit(2.5)).cast("array<float>").alias("vec"),
    )
    out = pooling.mean_pool(df, "doc_id", "vec").collect()
    assert all(r["pooled"] == [1.5, 2.5] for r in out)
