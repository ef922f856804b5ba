"""as-of join edge semantics: directions, tie-at-equal-ts, left rows
without a match, tolerance bound."""

from __future__ import annotations

import datetime as dt

import pytest

from embeddingsearch_spark.operators.asof import asof_join


def _ts(s):
    return dt.datetime(2024, 1, 1, 0, 0, s)


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [(1, "u", _ts(10)), (2, "u", _ts(20)), (3, "v", _ts(5))],
        "lid int, k string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("u", _ts(8), 100),
            ("u", _ts(10), 101),  # equal-ts with lid=1 → must match (>=)
            ("u", _ts(15), 102),
            ("v", _ts(9), 103),  # after v's only left row
        ],
        "k string, ts timestamp, rid int",
    )
    return left, right


def _rows(df):
    return {r["lid"]: r for r in df.collect()}

def test_backward_inner(frames):
    left, right = frames
    out = _rows(asof_join(left, right, on="k"))
    assert set(out) == {1, 2}  # lid=3 has no click at-or-before → dropped
    assert out[1]["rid"] == 101  # equal ts matches, beats ts=8
    assert out[2]["rid"] == 102
    assert out[1]["ts_r"] == _ts(10)


def test_backward_left(frames):
    left, right = frames
    out = _rows(asof_join(left, right, on="k", how="left"))
    assert set(out) == {1, 2, 3}
    assert out[3]["rid"] is None and out[3]["ts_r"] is None


def test_forward(frames):
    left, right = frames
    out = _rows(asof_join(left, right, on="k", direction="forward"))
    assert set(out) == {1, 3}  # lid=2 (ts=20) has nothing at-or-after
    assert out[1]["rid"] == 101  # equal ts still wins over ts=15
    assert out[3]["rid"] == 103


def test_tolerance(frames):
    left, right = frames
    out = _rows(
        asof_join(left, right, on="k", tolerance_seconds=3, how="left")
    )
    # lid=2 best match is ts=15 (5s gap) → nulled by 3s tolerance
    assert out[1]["rid"] == 101
    assert out[2]["rid"] is None
    inner = _rows(asof_join(left, right, on="k", tolerance_seconds=3))
    assert set(inner) == {1}


def test_no_extra_shuffle(frames):
    left, right = frames
    plan = asof_join(left, right, on="k")._jdf.queryExecution().toString()
    # one exchange for the window partitioning; the union must not add more
    assert plan.count("Exchange hashpartitioning") <= 1
