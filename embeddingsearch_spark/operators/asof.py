"""As-of join: for every left row, the single most recent right row at or
before it (per key) — the attribution / point-in-time-lookup primitive a
training-data pipeline needs (label joins, feature snapshots). The
reference has no temporal joins (its only time dimension is cache LRU,
CacheHelper.cs:223-240); this is a beyond-reference scale operator.

Spark-first strategy: NOT a pair join. A join with a range predicate
degenerates to broadcast-nested-loop (O(L×R) comparisons); pandas
``merge_asof`` inside ``applyInPandas`` works but leaves the JVM. Instead,
union both sides, sort each key's timeline once, and carry the latest
right payload forward with ``last(..., ignorenulls=True)`` over a running
window — ONE shuffle on the key, one linear scan per partition, all
JVM-side. Spark evaluates running frames (UNBOUNDED PRECEDING..CURRENT
ROW) incrementally, so the window is O(n) per key, and at 100 TB the only
cost is the same exchange an equi-join would need anyway.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    ts: str = "ts",
    direction: str = "backward",
    how: str = "inner",
    suffix: str = "_r",
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """Match each left row with the nearest right row per key.

    direction="backward": greatest right ``ts`` <= left ``ts`` (DuckDB
    ``ASOF JOIN ... ON l.k = r.k AND l.ts >= r.ts`` semantics, ties on
    equal timestamps match). "forward": smallest right ``ts`` >= left.

    Output: every left column, plus every non-key right column — renamed
    with ``suffix`` only where the name collides with a left column.
    ``how`` is "inner" (drop unmatched left rows, DuckDB's default) or
    "left". ``tolerance_seconds`` additionally bounds |l.ts - r.ts|.
    Among right rows tied on (key, ts) the winner is unspecified — feed
    timelines with distinct timestamps per key (or pre-aggregate).
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    if how not in ("inner", "left"):
        raise ValueError("how must be 'inner' or 'left'")
    keys = [on] if isinstance(on, str) else list(on)
    r_payload = [c for c in right.columns if c not in keys]
    if ts not in r_payload:
        raise ValueError(f"right side must carry timestamp column {ts!r}")

    l_struct = left.select(F.struct(*left.columns).alias("_l")).schema[
        "_l"
    ].dataType
    r_struct = right.select(F.struct(*r_payload).alias("_r")).schema[
        "_r"
    ].dataType

    # _side orders right(0) before left(1) at equal ts, so an equal-ts
    # right row is visible to the left row (ASOF's >= / <= includes ties).
    l_side = left.select(
        *keys,
        F.col(ts).alias("_ats"),
        F.lit(1).alias("_side"),
        F.struct(*left.columns).alias("_l"),
        F.lit(None).cast(r_struct).alias("_r"),
    )
    r_side = right.select(
        *keys,
        F.col(ts).alias("_ats"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(l_struct).alias("_l"),
        F.struct(*r_payload).alias("_r"),
    )
    order = (
        [F.col("_ats").asc(), F.col("_side").asc()]
        if direction == "backward"
        else [F.col("_ats").desc(), F.col("_side").asc()]
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        l_side.unionByName(r_side)
        .withColumn("_m", F.last("_r", ignorenulls=True).over(w))
        .filter(F.col("_side") == 1)
    )
    if tolerance_seconds is not None:
        within = (
            F.abs(
                F.col("_ats").cast("double")
                - F.col(f"_m.{ts}").cast("double")
            )
            <= F.lit(float(tolerance_seconds))
        )
        matched = matched.withColumn(
            "_m", F.when(within, F.col("_m"))
        )
    if how == "inner":
        matched = matched.filter(F.col("_m").isNotNull())

    left_cols = set(left.columns)
    out = [F.col(f"_l.{c}").alias(c) for c in left.columns] + [
        F.col(f"_m.{c}").alias(c + suffix if c in left_cols else c)
        for c in r_payload
    ]
    return matched.select(*out)
