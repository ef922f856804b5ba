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


def test_foreachbatch_winnow_gate_with_persisted_fp_table(spark, tmp_path):
    """The substring-granular gate in the same pipeline shape, probing a
    PERSISTED fingerprint table (built once from the indexed corpus) and
    AUGMENTING it with each accepted batch — ingest cost follows the
    batch, the corpus is never re-winnowed."""
    from embeddingsearch_spark.operators import winnow as wn

    indexed = spark.createDataFrame(
        [(i, t) for i, t in enumerate(BASE)], "doc_id long, text string"
    )
    fp_path = str(tmp_path / "fp_table")
    wn.winnow_fingerprints(indexed, "doc_id", "text").write.parquet(fp_path)

    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    spark.createDataFrame(
        [
            (10, BASE[0]),                          # exact re-delivery
            (11, "x y " + BASE[1]),                 # partial copy (embedded span)
            (12, "volcano monitoring stations emit fresh daily bulletins"),
        ],
        "doc_id long, text string",
    ).write.parquet(src)

    def gate(batch, batch_id):
        fp_table = spark.read.parquet(fp_path)
        flags = wn.incremental_winnow_gate(batch, fp_table, "doc_id", "text")
        new_ids = flags.filter("is_new").select("doc_id")
        accepted = batch.join(new_ids, "doc_id")
        accepted.write.mode("append").parquet(sink)
        # augment: only the accepted batch is winnowed, never the corpus
        wn.winnow_fingerprints(accepted, "doc_id", "text").write.mode(
            "append"
        ).parquet(fp_path)

    q = (
        spark.readStream.schema("doc_id long, text string")
        .parquet(src)
        .writeStream.foreachBatch(gate)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .start()
    )
    q.awaitTermination(120)

    out = spark.read.parquet(sink)
    assert sorted(r.doc_id for r in out.collect()) == [12]
    # the accepted doc's fingerprints joined the table: a re-delivery of
    # doc 12's text is now caught by the augmented table
    redelivery = spark.createDataFrame(
        [(20, "volcano monitoring stations emit fresh daily bulletins")],
        "doc_id long, text string",
    )
    flags2 = wn.incremental_winnow_gate(
        redelivery, spark.read.parquet(fp_path), "doc_id", "text"
    ).collect()
    assert not flags2[0]["is_new"] and flags2[0]["best_match"] == 12
