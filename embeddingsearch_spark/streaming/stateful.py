"""Custom stateful streaming operators (SURVEY.md §2.9 — the reference is
processing-time only; these are the beyond-reference stateful pieces a
streaming training-data pipeline needs).

- :func:`streaming_dedup` — cross-batch exact dedup: only the FIRST
  occurrence of a key ever emits. Built on the engine-native
  `dropDuplicates` state store (per-key state, watermark-expirable).
- :func:`running_user_stats` — `applyInPandasWithState`: arbitrary
  per-key state maintained across micro-batches (running event count /
  value sum per user). The pattern to copy for custom stateful logic
  that no built-in aggregation expresses.

At scale: both keep per-key state in the state store, partitioned by the
grouping key — state size is bounded by distinct keys (use watermarks to
expire). Batch-mode equivalents exist for both (exact dedup, groupBy
agg), so tests can check stream-vs-batch equality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def streaming_dedup(
    stream: DataFrame,
    key_cols: list[str],
    watermark: tuple[str, str] | None = None,
) -> DataFrame:
    """Emit only the first-ever occurrence of each key across all
    micro-batches (the streaming form of exact dedup; state = one entry
    per distinct key, expired by the optional (ts_col, delay) watermark)."""
    df = stream
    if watermark is not None:
        df = df.withWatermark(*watermark)
        return df.dropDuplicates(key_cols + [watermark[0]])
    return df.dropDuplicates(key_cols)


STATS_STATE_SCHEMA = "n_events long, total_value double"
STATS_OUT_SCHEMA = "user_id long, n_events long, total_value double"


def _update_user_stats(key, pdfs, state: GroupState):
    import pandas as pd

    n, total = 0, 0.0
    if state.exists:
        n, total = state.get
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
    )


def running_user_stats(stream: DataFrame) -> DataFrame:
    """Per-user running (n_events, Σvalue) maintained across batches via
    applyInPandasWithState — emits the updated totals for every user seen
    in each micro-batch."""
    return stream.groupBy("user_id").applyInPandasWithState(
        _update_user_stats,
        outputStructType=STATS_OUT_SCHEMA,
        stateStructType=STATS_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
