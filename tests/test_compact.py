"""storage.compact: many small files → few right-sized files, data
identical, hive partitioning preserved."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from embeddingsearch_spark.storage import _list_data_files, compact


def _write_fragmented(spark, path, partitioned=False):
    df = spark.range(5000).select(
        F.col("id"),
        (F.col("id") % 3).alias("part"),
        F.sha2(F.col("id").cast("string"), 256).alias("payload"),
    )
    w = df.repartition(40).write.mode("overwrite")
    if partitioned:
        w = w.partitionBy("part")
    w.parquet(path)
    return df


def _contents(spark, path):
    return sorted(
        (r["id"], r["part"], r["payload"])
        for r in spark.read.parquet(path).collect()
    )


def test_compact_flat(spark, tmp_path):
    path = os.path.join(str(tmp_path), "frag")
    df = _write_fragmented(spark, path)
    before = _contents(spark, path)
    stats = compact(spark, path, target_file_mb=256)
    assert stats["files_before"] == 40
    assert stats["files_after"] == 1  # tiny data « target size
    assert _contents(spark, path) == before
    assert not os.path.exists(path + "._compact_tmp")
    assert not os.path.exists(path + "._compact_old")


def test_compact_partitioned(spark, tmp_path):
    path = os.path.join(str(tmp_path), "fragp")
    _write_fragmented(spark, path, partitioned=True)
    before = _contents(spark, path)
    n_before = len(_list_data_files(path))
    compact(spark, path, target_file_mb=256, partition_cols=["part"],
            sort_cols=["id"])
    assert _contents(spark, path) == before
    # one file per hive partition directory after compaction
    assert len(_list_data_files(path)) == 3 < n_before
    parts = {
        os.path.basename(os.path.dirname(p))
        for p, _ in _list_data_files(path)
    }
    assert parts == {"part=0", "part=1", "part=2"}


def test_write_training_shards(spark, tmp_path):
    from embeddingsearch_spark.operators.splits import epoch_shuffle
    from embeddingsearch_spark.storage import write_training_shards

    path = os.path.join(str(tmp_path), "shards")
    docs = spark.range(1000).select(F.col("id").alias("doc_id"))
    shuffled = epoch_shuffle(docs, "doc_id", epoch=1, n_shards=4)
    stats = write_training_shards(
        shuffled, path, n_shards=4, order_cols=["pos"]
    )
    assert stats["rows"] == 1000
    assert stats["n_files"] == 4
    back = spark.read.parquet(path)
    # shard membership reproducible: every file holds whole shards
    assert back.select("shard").distinct().count() == 4
    # per-file record cap splits oversized shards without another pass
    capped = os.path.join(str(tmp_path), "capped")
    stats2 = write_training_shards(
        shuffled, capped, n_shards=4, order_cols=["pos"],
        max_records_per_file=100,
    )
    assert stats2["rows"] == 1000
    assert stats2["n_files"] >= 10
