"""interval_join: result-identical to the naive range join, without the
BroadcastNestedLoopJoin plan, and no duplicate pairs across buckets."""

from __future__ import annotations

import datetime as dt
import random

import pytest
from pyspark.sql import functions as F

from embeddingsearch_spark.operators.rangejoin import interval_join


@pytest.fixture(scope="module")
def frames(spark):
    rnd = random.Random(7)
    base = dt.datetime(2024, 1, 1)
    left = spark.createDataFrame(
        [
            (i, rnd.randrange(4), base + dt.timedelta(seconds=rnd.randrange(400_000)))
            for i in range(120)
        ],
        "lid int, k int, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (i, rnd.randrange(4), base + dt.timedelta(seconds=rnd.randrange(400_000)))
            for i in range(300)
        ],
        "rid int, k int, ts timestamp",
    )
    return left, right


def _pairs(df):
    return sorted((r["lid"], r["rid"]) for r in df.collect())


def test_matches_naive_range_join(frames):
    left, right = frames
    start = F.col("ts") - F.expr("INTERVAL 6 HOURS")
    out = interval_join(
        left, right, on="k", left_start=start, left_end=F.col("ts"),
        bucket_seconds=3600,
    )
    naive = left.alias("l").join(
        right.alias("r"),
        (F.col("l.k") == F.col("r.k"))
        & (F.col("r.ts") >= F.col("l.ts") - F.expr("INTERVAL 6 HOURS"))
        & (F.col("r.ts") < F.col("l.ts")),
    ).select(F.col("l.lid"), F.col("r.rid"))
    assert _pairs(out) == _pairs(naive)
    assert len(_pairs(out)) == len(set(_pairs(out)))  # no bucket dupes


def test_no_nested_loop_plan(frames):
    left, right = frames
    out = interval_join(
        left, right, on="k",
        left_start=F.col("ts") - F.expr("INTERVAL 6 HOURS"),
        left_end=F.col("ts"), bucket_seconds=3600,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan


def test_suffixes_colliding_right_columns(frames):
    left, right = frames
    out = interval_join(
        left, right, on="k",
        left_start=F.col("ts") - F.expr("INTERVAL 6 HOURS"),
        left_end=F.col("ts"),
    )
    assert "ts" in out.columns and "ts_r" in out.columns
    assert "rid" in out.columns  # non-colliding name kept as-is


def test_multi_key(spark):
    base = dt.datetime(2024, 1, 1)
    left = spark.createDataFrame(
        [(1, "u", "x", base + dt.timedelta(hours=2))],
        "lid int, k1 string, k2 string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("u", "x", base + dt.timedelta(hours=1), 10),
            ("u", "y", base + dt.timedelta(hours=1), 11),  # k2 differs
            ("u", "x", base + dt.timedelta(hours=5), 12),  # outside window
        ],
        "k1 string, k2 string, ts timestamp, rid int",
    )
    out = interval_join(
        left, right, on=["k1", "k2"],
        left_start=F.col("ts") - F.expr("INTERVAL 3 HOURS"),
        left_end=F.col("ts"), bucket_seconds=3600,
    )
    assert [(r["lid"], r["rid"]) for r in out.collect()] == [(1, 10)]
