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


def asof_join_chunked(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    ts: str = "ts",
    chunk_seconds: int = 86400,
    how: str = "inner",
    suffix: str = "_r",
) -> DataFrame:
    """`asof_join` (backward direction) for HOT KEYS: identical results,
    bounded partitions. The plain operator windows over the whole per-key
    timeline — one partition per key, fatal when one key holds 10⁸ rows.
    Here the timeline splits into fixed time chunks:

    1. the running-last window runs per (key, chunk) — partition size is
       bounded by chunk width, not key cardinality;
    2. a chunk-level summary (one row per (key, chunk): the chunk's final
       right payload — orders of magnitude smaller than the data) gets a
       strictly-before running window to produce each chunk's carry-in;
    3. left rows with no in-chunk match coalesce to the carry-in.

    Same output contract and tie semantics as `asof_join`. Two extra
    exchanges over a tiny summary buy partition-size independence from
    key skew — the trade a 1000-executor cluster wants.
    """
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
    chunk = lambda c: F.floor(  # noqa: E731
        c.cast("double") / F.lit(float(chunk_seconds))
    ).cast("long")

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
    u = l_side.unionByName(r_side).withColumn("_b", chunk(F.col("_ats")))

    w_local = (
        Window.partitionBy(*keys, "_b")
        .orderBy(F.col("_ats").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = u.withColumn("_m_local", F.last("_r", ignorenulls=True).over(w_local))

    # chunk-level: final right payload per (key, chunk) — max_by over
    # (_ats, _side) mirrors the row-level tie order
    summary = (
        r_side.withColumn("_b", chunk(F.col("_ats")))
        .groupBy(*keys, "_b")
        .agg(F.max_by("_r", F.struct("_ats", "_side")).alias("_chunk_last"))
    )
    # every chunk any left row lives in must appear, even right-empty ones
    all_chunks = u.select(*keys, "_b").distinct()
    w_carry = (
        Window.partitionBy(*keys)
        .orderBy("_b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = (
        all_chunks.join(summary, keys + ["_b"], "left")
        .withColumn(
            "_carry", F.last("_chunk_last", ignorenulls=True).over(w_carry)
        )
        .select(*keys, "_b", "_carry")
    )

    matched = (
        local.filter(F.col("_side") == 1)
        .join(carry, keys + ["_b"])
        .withColumn("_m", F.coalesce("_m_local", "_carry"))
    )
    if how == "inner":
        matched = matched.filter(F.col("_m").isNotNull())
    left_cols = set(left.columns)
    out = [F.col(f"_l.{c}").alias(c) for c in left.columns] + [
        F.col(f"_m.{c}").alias(c + suffix if c in left_cols else c)
        for c in r_payload
    ]
    return matched.select(*out)
