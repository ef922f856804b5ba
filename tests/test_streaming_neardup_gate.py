"""Integration: the near-dup ingest gate inside a Structured Streaming
foreachBatch — the re-crawl pipeline shape (stream of re-delivered +
edited + fresh docs, only genuinely-new content reaches the sink).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from embeddingsearch_spark.operators import dedup

BASE = [
    "the quick brown fox jumps over the lazy dog near the river bank",
    "spark shuffles exchanges and whole stage codegen pipelines nightly",
    "parquet footers carry min max statistics for file level skipping",
]


def test_foreachbatch_neardup_gate(spark, tmp_path):
    indexed = spark.createDataFrame(
        [(i, t) for i, t in enumerate(BASE)], "doc_id long, text string"
    )
    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    incoming = spark.createDataFrame(
        [
            (10, BASE[0]),                       # exact re-delivery
            (11, BASE[1] + " tiny edit"),        # near copy
            (12, "genuinely fresh content about volcano monitoring"),
            (13, "another brand new doc on tide gauges and buoys"),
        ],
        "doc_id long, text string",
    )
    incoming.write.parquet(src)

    def gate(batch, batch_id):
        flags = dedup.incremental_neardup(
            batch, indexed, "doc_id", "text"
        )
        new_ids = flags.filter("is_new").select("doc_id")
        batch.join(new_ids, "doc_id").write.mode("append").parquet(sink)

    q = (
        spark.readStream.schema("doc_id long, text string")
        .parquet(src)
        .writeStream.foreachBatch(gate)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)

    out = spark.read.parquet(sink)
    assert sorted(r.doc_id for r in out.collect()) == [12, 13]
