"""Event-time windowed aggregation over streams — beyond-reference (the
reference is processing-time only, SURVEY.md §2.9) but required for any
event-log rollup at scale: watermark bounds state, tumbling windows give
incremental per-window partial aggregates (map-side combine per batch).

`windowed_rollup` builds the streaming plan; `run_available_now` drains a
(file-)stream through it into an in-memory sink and returns the result as
a plain DataFrame — used by tests and the driver suite so the SAME plan is
checkable against a batch SQL oracle (with a single AvailableNow batch over
static input, complete-mode output ≡ the batch aggregation).
"""

from __future__ import annotations

import itertools
import tempfile

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_sink_ids = itertools.count()


def windowed_rollup(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str | None = "1 day",
    ts_col: str = "ts",
    round_digits: int = 6,
) -> DataFrame:
    """Tumbling-window rollup per (window, event_type): counts + value sum.
    Works on both streaming and batch DataFrames (same plan either way)."""
    df = events
    if watermark is not None and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.window(ts_col, window), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), round_digits).alias("total_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def run_available_now(
    stream_df: DataFrame,
    output_mode: str = "complete",
    shuffle_partitions: int | None = None,
) -> DataFrame:
    """Drain a streaming DataFrame into a memory sink with one AvailableNow
    pass; returns the sink contents. Complete mode over static input equals
    the batch aggregation (watermarks never drop within a single batch).

    ``shuffle_partitions`` sizes the STATE STORE: a stateful streaming
    query creates one state-store instance per shuffle partition, fixed
    for the checkpoint's lifetime, and per-batch overhead scales with
    instance count, not data. Size it to expected state volume (measured:
    the stream-stream join drains 2.9× faster at 8 than at the batch
    default 32 on micro-batches). Scoped set/restore — the session's
    batch setting is untouched afterwards; the streaming query latches
    its value at start."""
    spark = stream_df.sparkSession
    key = "spark.sql.shuffle.partitions"
    old = spark.conf.get(key)
    if shuffle_partitions is not None:
        spark.conf.set(key, str(shuffle_partitions))
    try:
        name = f"es_stream_sink_{next(_sink_ids)}"
        q = (
            stream_df.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .option(
                "checkpointLocation",
                tempfile.mkdtemp(prefix="es_stream_ckpt_"),
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        if shuffle_partitions is not None:
            spark.conf.set(key, old)
    return spark.table(name)
