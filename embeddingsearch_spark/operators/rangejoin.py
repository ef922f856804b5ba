"""Interval (range) join: left rows carry a time window [start, end),
right rows a point timestamp; emit every (left, right) pair whose point
falls in the window, sharing optional equality keys. Beyond-reference
(the reference has no temporal joins) — the "events within N hours of X"
primitive for feature windows and attribution counts.

Spark-first strategy: a raw range predicate alone gives Catalyst no hash
key — without an equi-conjunct the plan degenerates to
BroadcastNestedLoopJoin, O(L×R). Binning manufactures the hash key: the
left window explodes to the fixed-width time buckets it covers
(``sequence``), the right point maps to its single bucket, and the join
becomes an equi-join on (keys…, bucket) + an exact range filter. Each
right point lives in exactly one bucket, so no pair is emitted twice and
no dedup pass is needed. Pick ``bucket_seconds`` ≈ the typical window
span: left fan-out stays O(span/bucket + 1) ≈ 2 while each bucket's
candidate set stays small — at 100 TB this is a plain shuffled hash join
whose skew AQE can split, instead of a nested loop that never finishes.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket(c: Column, bucket_seconds: int) -> Column:
    # floor over epoch seconds; works for negative epochs too
    return F.floor(c.cast("double") / F.lit(float(bucket_seconds))).cast(
        "long"
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_start: Column,
    left_end: Column,
    right_ts: str = "ts",
    bucket_seconds: int = 86400,
) -> DataFrame:
    """Inner pair join: rows where ``left_start <= right.ts < left_end``
    and the ``on`` keys are equal. ``left_start`` / ``left_end`` are
    Column expressions over the left side (e.g. ``F.col("ts") -
    F.expr("INTERVAL 24 HOURS")``). Colliding right column names get a
    ``_r`` suffix. Compose with groupBy for windowed counts.
    """
    keys = [on] if isinstance(on, str) else list(on)
    lb = left.withColumns(
        {"_start": left_start, "_end": left_end}
    ).withColumn(
        "_b",
        F.explode(
            F.sequence(
                _bucket(F.col("_start"), bucket_seconds),
                _bucket(F.col("_end"), bucket_seconds),
            )
        ),
    )
    left_cols = set(left.columns)
    rb = right.select(
        *[F.col(k) for k in keys],
        _bucket(F.col(right_ts), bucket_seconds).alias("_b"),
        *[
            F.col(c).alias(c + "_r" if c in left_cols else c)
            for c in right.columns
            if c not in keys
        ],
    )
    ts_r = right_ts + "_r" if right_ts in left_cols else right_ts
    pairs = lb.join(rb, keys + ["_b"]).filter(
        (F.col(ts_r) >= F.col("_start")) & (F.col(ts_r) < F.col("_end"))
    )
    return pairs.drop("_b", "_start", "_end")
