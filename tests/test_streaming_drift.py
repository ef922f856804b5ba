"""Streaming vocabulary-drift monitor: per-batch history, pinned
running counts, and batch-equivalence of the final summary regardless
of micro-batch boundaries."""

from __future__ import annotations

from pyspark.sql import functions as F


def _write_feed(spark, path, rows_per_file):
    for i, rows in enumerate(rows_per_file):
        spark.createDataFrame(
            rows, "doc_id long, text string"
        ).coalesce(1).write.mode("overwrite").parquet(f"{path}/f{i}")


def test_streaming_drift_multibatch_equals_batch(spark, tmp_path):
    from embeddingsearch_spark.operators.drift import vocab_drift
    from embeddingsearch_spark.streaming.drift import (
        vocab_drift_available_now,
    )

    feed = [
        [(1, "alpha beta beta gamma"), (2, "alpha alpha delta")],
        [(3, "epsilon beta alpha"), (4, "zeta zeta zeta eta")],
        [(5, "theta alpha beta")],
    ]
    base = str(tmp_path / "feed")
    _write_feed(spark, base, feed)
    reference = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon"), (101, "alpha beta")],
        "doc_id long, text string",
    )

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{base}/f*")
    )
    mon = vocab_drift_available_now(
        stream, reference, vocab_size=64
    )
    # one history row per micro-batch, cumulative token totals rising
    assert len(mon.history) >= 2, mon.history
    totals = [h[2] for h in mon.history]
    assert totals == sorted(totals) and totals[-1] == 17

    # final summary ≡ the batch computation over the whole feed
    all_docs = spark.createDataFrame(
        [r for f in feed for r in f], "doc_id long, text string"
    )
    batch_summary, batch_tok = vocab_drift(
        all_docs, reference, vocab_size=64
    )
    got = mon.drift()[0].collect()[0]
    want = batch_summary.collect()[0]
    assert got.asDict() == want.asDict()
    # per-token frames match too
    got_tok = sorted(tuple(r) for r in mon.drift()[1].collect())
    want_tok = sorted(tuple(r) for r in batch_tok.collect())
    assert got_tok == want_tok
    # divergence recorded mid-stream (alerting surface): every entry
    # is a finite float
    assert all(isinstance(h[1], float) for h in mon.history)
