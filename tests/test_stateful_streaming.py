"""Stateful streaming: cross-batch dedup emits each key once ever;
applyInPandasWithState running totals converge to the batch aggregate."""

from __future__ import annotations

import glob
import shutil
import tempfile

from pyspark.sql import functions as F

from embeddingsearch_spark.streaming import stateful


def _write_flat(df, tmp_path, target_dir, name):
    staging = str(tmp_path / f"_stage_{name}")
    df.coalesce(1).write.parquet(staging)
    target_dir.mkdir(exist_ok=True)
    shutil.move(
        glob.glob(f"{staging}/part-*.parquet")[0],
        str(target_dir / f"{name}.parquet"),
    )


def _run_stream(spark, input_dir, schema, build, mode="append"):
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(input_dir))
    )
    out = build(stream)
    name = f"sink_{abs(hash(str(input_dir))) % 10**9}"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="es_state_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def test_streaming_dedup_across_batches(spark, tmp_path):
    d = tmp_path / "in"
    schema = "doc_id long, fp string"
    b1 = spark.createDataFrame([(1, "a"), (2, "b")], schema)
    b2 = spark.createDataFrame([(3, "a"), (4, "c")], schema)  # 'a' repeats
    _write_flat(b1, tmp_path, d, "f1")
    _write_flat(b2, tmp_path, d, "f2")

    out = _run_stream(
        spark, d, b1.schema, lambda s: stateful.streaming_dedup(s, ["fp"])
    )
    fps = sorted(r.fp for r in out.collect())
    assert fps == ["a", "b", "c"]  # second 'a' suppressed across batches


def test_running_user_stats_converges_to_batch_agg(spark, tmp_path):
    d = tmp_path / "in"
    schema = "user_id long, value double"
    b1 = spark.createDataFrame([(1, 2.0), (1, 3.0), (2, 1.0)], schema)
    b2 = spark.createDataFrame([(1, 5.0), (3, 7.0)], schema)
    _write_flat(b1, tmp_path, d, "f1")
    _write_flat(b2, tmp_path, d, "f2")

    out = _run_stream(
        spark, d, b1.schema, stateful.running_user_stats, mode="update"
    )
    # update mode emits a row per (user, batch); n_events is monotone, so
    # the max row per user is the final running total (row order in the
    # memory sink is not guaranteed)
    rows = out.collect()
    last = {}
    for r in rows:
        if r.user_id not in last or r.n_events > last[r.user_id][0]:
            last[r.user_id] = (r.n_events, r.total_value)
    assert last[1] == (3, 10.0)
    assert last[2] == (1, 1.0)
    assert last[3] == (1, 7.0)
