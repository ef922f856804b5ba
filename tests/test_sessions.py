"""Sessionize semantics: gap strictly-greater-than boundary, per-user
independence, session rollups."""

from __future__ import annotations

import datetime

from embeddingsearch_spark.operators import sessions

BASE = datetime.datetime(2024, 1, 1)


def _ev(user, offset_s, value=1.0):
    return (user, BASE + datetime.timedelta(seconds=offset_s), value)


def test_gap_boundary_is_strict(spark):
    """An exactly-gap-sized silence does NOT split; gap+1µs does."""
    rows = [
        _ev(1, 0),
        _ev(1, 60),          # same session (60 == gap, not >)
        _ev(1, 120.000001),  # new session (60.000001 > gap)
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    got = sorted(
        (r.user_id, r.session_seq)
        for r in sessions.sessionize(df, gap_seconds=60).collect()
    )
    assert got == [(1, 1), (1, 1), (1, 2)]


def test_users_independent_and_stats(spark):
    rows = [_ev(1, 0, 2.0), _ev(1, 30, 3.0), _ev(2, 10, 5.0), _ev(1, 500, 1.0)]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    stats = {
        (r.user_id, r.session_seq): r
        for r in sessions.session_stats(df, gap_seconds=60).collect()
    }
    assert set(stats) == {(1, 1), (1, 2), (2, 1)}
    assert stats[(1, 1)].n_events == 2
    assert stats[(1, 1)].total_value == 5.0
    assert stats[(1, 2)].n_events == 1
    assert stats[(2, 1)].total_value == 5.0
