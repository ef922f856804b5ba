"""Streaming ingest (T4 file source → foreachBatch merge) and windowed
event rollups: multi-batch incremental build converges to the batch build;
streaming window aggregation equals the batch plan."""

from __future__ import annotations

import datetime
import glob
import shutil

from pyspark.sql import functions as F

from embeddingsearch_spark.operators import index_build
from embeddingsearch_spark.streaming import windows as win
from embeddingsearch_spark.streaming.ingest import ingest_available_now

INGEST_SCHEMA = (
    "searchdomain string, entity string, entity_probmethod string, "
    "attributes map<string,string>, datapoint string, dp_probmethod string, "
    "simmethod string, text string, models array<string>"
)


def _write_flat(df, tmp_path, target_dir, name):
    """The file stream source scans files directly under its path — write
    one parquet part and move it in flat as ``name``.parquet."""
    staging = str(tmp_path / f"_stage_{name}")
    df.coalesce(1).write.parquet(staging)
    target_dir.mkdir(exist_ok=True)
    shutil.move(glob.glob(f"{staging}/part-*.parquet")[0], str(target_dir / f"{name}.parquet"))


def _rows(ids, text_fn=lambda i: f"stream doc {i} body"):
    return [
        (
            "sd",
            f"ent_{i}",
            "Mean",
            None,
            "text",
            "Mean",
            "Cosine",
            text_fn(i),
            ["mock:modelA"],
        )
        for i in ids
    ]


def test_multibatch_ingest_converges_to_batch_build(spark, tmp_path):
    """Two files → two micro-batches; the merged index equals one batch
    build over the union, and overlapping entities take the later value."""
    d = tmp_path / "in"
    # batch 1: ents 0-4; batch 2: ents 3-7 with changed text for 3,4
    _write_flat(
        spark.createDataFrame(_rows(range(5)), INGEST_SCHEMA), tmp_path, d, "f1"
    )
    _write_flat(
        spark.createDataFrame(
            _rows(range(3, 8), text_fn=lambda i: f"v2 doc {i}"), INGEST_SCHEMA
        ),
        tmp_path,
        d,
        "f2",
    )

    indexer = ingest_available_now(
        spark,
        str(d),
        schema=spark.createDataFrame([], INGEST_SCHEMA).schema,
        dim=8,
        max_files_per_trigger=1,
        path_glob="*.parquet",
        transform=None,
    )
    assert indexer.n_batches == 2

    got = {
        (r.entity, r.text_hash)
        for r in indexer.index_flat.select("entity", "text_hash").collect()
    }
    # expected: 0-2 original, 3-7 v2 text
    expected_df = spark.createDataFrame(
        _rows(range(3)) + _rows(range(3, 8), text_fn=lambda i: f"v2 doc {i}"),
        INGEST_SCHEMA,
    )
    expected = {
        (r.entity, r.text_hash)
        for r in index_build.build_index(expected_df, None, 8)
        .index_flat.select("entity", "text_hash")
        .collect()
    }
    assert got == expected


def test_ingest_cache_grows_and_dedupes(spark, tmp_path):
    """Identical text in both batches is embedded once (batch 2 hits the
    cache built by batch 1)."""
    d = tmp_path / "in"
    same = _rows([0, 1], text_fn=lambda i: "shared text")
    _write_flat(spark.createDataFrame(same[:1], INGEST_SCHEMA), tmp_path, d, "f1")
    _write_flat(spark.createDataFrame(same[1:], INGEST_SCHEMA), tmp_path, d, "f2")
    indexer = ingest_available_now(
        spark,
        str(d),
        schema=spark.createDataFrame([], INGEST_SCHEMA).schema,
        dim=8,
        max_files_per_trigger=1,
        path_glob="*.parquet",
    )
    # one distinct (text, model) → exactly one cache row despite two batches
    assert indexer.embedding_cache.count() == 1
    assert indexer.index_flat.count() == 2


def test_streaming_window_rollup_equals_batch(spark, tmp_path):
    base = datetime.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (i, base + datetime.timedelta(minutes=7 * i), f"t{i % 3}", float(i))
        for i in range(100)
    ]
    schema = "event_id long, ts timestamp, event_type string, value double"
    df = spark.createDataFrame(rows, schema)
    d = str(tmp_path / "ev")
    df.coalesce(1).write.parquet(d)

    stream = spark.readStream.schema(df.schema).parquet(d)
    streamed = win.run_available_now(
        win.windowed_rollup(stream, window="1 hour", watermark="1 day"),
        output_mode="complete",
    )
    batch = win.windowed_rollup(spark.read.parquet(d), window="1 hour")
    assert sorted(map(tuple, streamed.collect())) == sorted(
        map(tuple, batch.collect())
    )


def test_streaming_curation_gate(spark, tmp_path):
    """Scan-stage gates + state-store dedup on a streamed feed: short
    docs dropped, non-allowed language dropped, re-delivered duplicates
    collapse per (source, fingerprint)."""
    from embeddingsearch_spark.streaming.curation import curation_gate

    long_en = (
        "the quick brown fox jumps over the lazy dog and keeps "
        "running through the field all day long without a rest"
    )
    rows = [
        (1, "a", long_en),
        (2, "a", long_en),  # re-delivered dup (same source)
        (3, "b", long_en),  # same text, other source -> kept
        (4, "a", "too short"),
        (5, "a", "der schnelle braune fuchs springt über den faulen "
                 "hund und läuft den ganzen tag weiter durch das feld"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    d = str(tmp_path / "docs")
    df.coalesce(1).write.parquet(d)

    stream = spark.readStream.schema(df.schema).parquet(d)
    curated = curation_gate(
        stream,
        min_words=10,
        lang_allow=("en",),
        dedup_cols=("source",),
    )
    out = win.run_available_now(
        curated.select("doc_id", "source", "n_words"),
        output_mode="append",
    ).collect()
    by_source = {}
    for r in out:
        by_source.setdefault(r["source"], []).append(r)
    # one survivor per source: the English long doc, deduped within 'a'
    assert len(by_source["a"]) == 1 and len(by_source["b"]) == 1
    assert by_source["a"][0]["n_words"] == len(long_en.split())
