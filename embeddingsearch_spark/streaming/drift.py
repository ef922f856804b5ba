"""Streaming drift monitoring: per-micro-batch vocabulary divergence
against a reference snapshot.

The batch `operators/drift.vocab_drift` answers "did this corpus move
vs that one?"; continuous ingest needs the same answer per micro-batch
— BEFORE a drifting crawl poisons the index. The streaming-safe shape:

- the REFERENCE token counts are computed once (a batch aggregation
  over the reference snapshot) and pinned;
- each micro-batch's token counts merge into a RUNNING counts table
  (one groupBy per batch over vocabulary-bounded rows), eagerly
  checkpointed per batch — without the pin, batch k's lineage would
  replay every previous batch's aggregation (the k-means/PageRank
  iterative-lineage discipline);
- the cumulative JS divergence vs the reference is recorded after each
  batch (driver-side history, one tiny row per batch), so an alert can
  fire mid-stream;
- after the drain, the final running counts equal the batch counts of
  everything that streamed — so the final summary is BATCH-EQUIVALENT
  to `vocab_drift(streamed_corpus, reference)` regardless of how the
  feed was micro-batched (counts are associative), which is exactly
  what the gated oracle checks.

State lives in the driver as a pinned vocabulary-bounded DataFrame
(distinct-token rows), not in a state store: token counts need full
merge semantics (sum across batches) that `dropDuplicates` state
cannot express, and the table is bounded by the vocabulary, not the
stream.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class DriftMonitor:
    """Result of a drained monitoring run: the final cumulative counts,
    the per-batch divergence history, and the final (summary,
    per_token) drift frames vs the reference."""

    counts: DataFrame
    reference_counts: DataFrame
    vocab_size: int
    smoothing: float
    history: list = field(default_factory=list)

    def drift(self) -> tuple[DataFrame, DataFrame]:
        from embeddingsearch_spark.operators.drift import (
            vocab_drift_from_counts,
        )

        return vocab_drift_from_counts(
            self.counts,
            self.reference_counts,
            vocab_size=self.vocab_size,
            smoothing=self.smoothing,
        )


def vocab_drift_available_now(
    stream: DataFrame,
    reference: DataFrame,
    text_col: str = "text",
    vocab_size: int = 1024,
    smoothing: float = 1.0,
) -> DriftMonitor:
    """Drain ``stream`` with one AvailableNow pass, merging each
    micro-batch's token counts into the running table and recording
    the cumulative JS divergence vs ``reference`` after every batch.

    Returns the `DriftMonitor`; its ``history`` holds one
    ``(batch_id, js_divergence, n_stream_tokens)`` tuple per
    micro-batch and ``drift()`` yields the final frames the gated
    query returns."""
    from embeddingsearch_spark.operators.drift import (
        vocab_drift_from_counts,
    )
    from embeddingsearch_spark.operators.lmscore import (
        corpus_token_counts,
    )

    ref_counts = corpus_token_counts(
        reference, text_col
    ).localCheckpoint(eager=True)
    spark = stream.sparkSession
    empty = spark.createDataFrame([], "tok string, c long")
    monitor = DriftMonitor(
        counts=empty,
        reference_counts=ref_counts,
        vocab_size=vocab_size,
        smoothing=smoothing,
    )

    def step(batch_df: DataFrame, batch_id: int) -> None:
        bc = corpus_token_counts(batch_df, text_col)
        merged = (
            monitor.counts.unionByName(bc)
            .groupBy("tok")
            .agg(F.sum("c").alias("c"))
            # eager pin: cut the cross-batch lineage NOW, while this
            # batch's data is live — vocabulary-bounded rows
            .localCheckpoint(eager=True)
        )
        monitor.counts = merged
        summary, _ = vocab_drift_from_counts(
            merged, ref_counts, vocab_size=vocab_size,
            smoothing=smoothing,
        )
        row = summary.collect()[0]
        monitor.history.append(
            (int(batch_id), row["js_divergence"], int(row["n_a"]))
        )

    import tempfile

    q = (
        stream.writeStream.foreachBatch(step)
        .trigger(availableNow=True)
        .option(
            "checkpointLocation",
            tempfile.mkdtemp(prefix="esdrift_ckpt_"),
        )
        .start()
    )
    q.awaitTermination()
    return monitor
