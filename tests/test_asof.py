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


def test_chunked_equivalence(spark):
    # random timelines incl. a hot key holding half of all rows; the
    # chunked variant must be row-identical to the plain operator
    import random

    from embeddingsearch_spark.operators.asof import asof_join_chunked

    rnd = random.Random(11)
    base = dt.datetime(2024, 1, 1)

    def mk(n, id0):
        return [
            (
                id0 + i,
                "hot" if rnd.random() < 0.5 else f"k{rnd.randrange(6)}",
                base + dt.timedelta(seconds=rnd.randrange(500_000)),
            )
            for i in range(n)
        ]

    left = spark.createDataFrame(mk(400, 0), "lid int, k string, ts timestamp")
    right = spark.createDataFrame(
        [(i, k, t, i * 10) for i, k, t in mk(600, 1000)],
        "rid int, k string, ts timestamp, payload int",
    )

    def key(df):
        return sorted(
            (r["lid"], r["rid"], r["payload"]) for r in df.collect()
        )

    for how in ("inner", "left"):
        plain = key(asof_join(left, right, on="k", how=how))
        chunked = key(
            asof_join_chunked(
                left, right, on="k", chunk_seconds=3600, how=how
            )
        )
        assert plain == chunked
    # degenerate chunk sizes: everything in one chunk / one row per chunk
    for cs in (10**9, 1):
        assert key(asof_join(left, right, on="k")) == key(
            asof_join_chunked(left, right, on="k", chunk_seconds=cs)
        )


def test_no_extra_shuffle(frames):
    left, right = frames
    plan = asof_join(left, right, on="k")._jdf.queryExecution().toString()
    # one exchange for the window partitioning; the union must not add more
    assert plan.count("Exchange hashpartitioning") <= 1


def test_multi_key(spark):
    left = spark.createDataFrame(
        [(1, "u", "x", _ts(10)), (2, "u", "y", _ts(10)), (3, "v", "x", _ts(10))],
        "lid int, k1 string, k2 string, ts timestamp",
    )
    right = spark.createDataFrame(
        [("u", "x", _ts(5), 1), ("u", "y", _ts(7), 2), ("v", "y", _ts(3), 3)],
        "k1 string, k2 string, ts timestamp, rid int",
    )
    out = {
        r["lid"]: r["rid"]
        for r in asof_join(
            left, right, on=["k1", "k2"], how="left"
        ).collect()
    }
    # matches require BOTH keys equal
    assert out == {1: 1, 2: 2, 3: None}
