"""Gap-based sessionization — the window-function workhorse of event-log
pipelines (SURVEY.md §2.5: the reference's only window-shaped logic is
rank maintenance + LRU positions; sessionization is the beyond-reference
generalization a training-data pipeline needs for user activity slicing).

Shuffle shape at 100 TB: exactly one exchange on the partition key
(user) serves BOTH window functions (lag + running sum — same window
spec) AND the final per-session aggregation, because groupBy(user, seq)
is partition-compatible with the window's hash partitioning — Catalyst
reuses the exchange, so the whole operator is one shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 3600,
) -> DataFrame:
    """Split each user's event stream into sessions separated by gaps of
    more than ``gap_seconds``. Returns one row per event with a
    ``session_seq`` (1-based per user) attached."""
    w = Window.partitionBy(user_col).orderBy(ts_col)
    prev_ts = F.lag(ts_col).over(w)
    # microsecond arithmetic — second-truncation would misclassify events
    # exactly at the gap boundary
    is_new = F.when(
        prev_ts.isNull()
        | (
            F.unix_micros(F.col(ts_col)) - F.unix_micros(prev_ts)
            > gap_seconds * 1_000_000
        ),
        1,
    ).otherwise(0)
    return events.withColumn(
        "session_seq",
        F.sum(is_new).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )


def session_stats(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 3600,
    value_col: str | None = "value",
    round_digits: int = 6,
) -> DataFrame:
    """Per-session rollup: bounds, event count, optional value sum."""
    tagged = sessionize(events, user_col, ts_col, gap_seconds)
    aggs = [
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
    ]
    if value_col is not None:
        aggs.append(
            F.round(F.sum(value_col), round_digits).alias("total_value")
        )
    return tagged.groupBy(user_col, "session_seq").agg(*aggs)
