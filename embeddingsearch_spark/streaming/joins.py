"""Stream-stream joins (SURVEY.md §2.9 trigger surface, extended): the
watermarked interval join — Structured Streaming's native form of the
batch `operators/rangejoin.interval_join`. Both sides declare a watermark
and the join condition carries the event-time range, so the engine knows
exactly how long to buffer each side's state and evicts it as the
watermark advances — bounded state at unbounded input, the property that
matters on a real cluster ingesting events continuously.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join_stream(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str = "ts",
    lookback: str = "1 hour",
    watermark: str = "1 day",
) -> DataFrame:
    """Inner-join right rows whose ``ts`` falls in [left.ts − lookback,
    left.ts) with the same ``on`` key. Both inputs must be streaming
    DataFrames; right's non-key columns that collide with left's get a
    ``_r`` suffix (same contract as the batch operator)."""
    l = left.withWatermark(ts, watermark).alias("l")
    r = right.withWatermark(ts, watermark).alias("r")
    cond = (
        (F.col(f"l.{on}") == F.col(f"r.{on}"))
        & (F.col(f"r.{ts}") >= F.col(f"l.{ts}") - F.expr(f"INTERVAL {lookback}"))
        & (F.col(f"r.{ts}") < F.col(f"l.{ts}"))
    )
    left_cols = set(left.columns)
    out = [F.col(f"l.{c}").alias(c) for c in left.columns] + [
        F.col(f"r.{c}").alias(c + "_r" if c in left_cols else c)
        for c in right.columns
        if c != on
    ]
    return l.join(r, cond).select(*out)
