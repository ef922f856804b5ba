"""Batch index build + Engine API: cache-aware embedding, merge/finalize
semantics, end-to-end index→search round trip."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from embeddingsearch_spark.api import Engine
from embeddingsearch_spark.operators import index_build
from embeddingsearch_spark.sources.embedder import (
    deterministic_embedding,
    embed_map_in_pandas,
)

INGEST_SCHEMA = (
    "searchdomain string, entity string, entity_probmethod string, "
    "datapoint string, dp_probmethod string, simmethod string, "
    "text string, models array<string>"
)


def _ingest(spark, rows):
    return spark.createDataFrame(rows, INGEST_SCHEMA)


def _rows(n, text_fn=lambda i: f"document number {i} about topic {i % 3}"):
    return [
        (
            "sd",
            f"ent_{i}",
            "Mean",
            dp,
            "Mean",
            "Cosine",
            text_fn(i) if dp == "text" else f"{dp} of {i}",
            ["mock:modelA", "mock:modelB"],
        )
        for i in range(n)
        for dp in ("title", "text")
    ]


def test_embedder_paths_agree(spark):
    """Pure-Column embedder and mapInPandas provider path produce identical
    vectors (shared spec)."""
    df = spark.createDataFrame(
        [("hello world", "mock:modelA"), ("hello world", "mock:modelB"),
         ("other", "mock:modelA")],
        "text string, model string",
    )
    col_side = df.select(
        "text", "model",
        deterministic_embedding(F.col("text"), F.col("model"), 8).alias("v"),
    )
    py_side = embed_map_in_pandas(df, dim=8, out_col="v")
    a = {(r["text"], r["model"]): r["v"] for r in col_side.collect()}
    b = {(r["text"], r["model"]): r["v"] for r in py_side.collect()}
    assert a.keys() == b.keys()
    for k in a:
        assert a[k] == pytest.approx(b[k], abs=1e-12)
        assert sum(x * x for x in a[k]) == pytest.approx(1.0)  # L2-normalized


def test_build_dedups_and_uses_cache(spark):
    ing = _ingest(spark, _rows(4))
    first = index_build.build_index(ing, embedding_cache=None, dim=8)
    # 4 entities × 2 datapoints × 2 models, all texts distinct
    assert first.n_requested == 16
    assert first.n_embedded == 16
    assert first.n_cache_hits == 0
    assert first.index_flat.count() == 16

    # Re-index the same rows with the cache from round 1 → zero embeddings.
    cache = first.new_cache_entries.select("text_hash", "model", "vector")
    second = index_build.build_index(ing, embedding_cache=cache, dim=8)
    assert second.n_embedded == 0
    assert second.n_cache_hits == 16

    # Change ONE text → exactly its (text, model) pairs re-embed.
    changed = _ingest(
        spark,
        _rows(4, text_fn=lambda i: "CHANGED" if i == 0 else f"document number {i} about topic {i % 3}"),
    )
    third = index_build.build_index(changed, embedding_cache=cache, dim=8)
    assert third.n_embedded == 2  # one new text × two models


def test_merge_and_finalize(spark):
    ing1 = _ingest(spark, _rows(3))
    idx1 = index_build.build_index(ing1, dim=8).index_flat
    # entity 1 re-uploaded with a different probmethod → replaced wholesale
    ing2 = _ingest(
        spark,
        [r if r[1] != "ent_1" else (*r[:2], "HVEWAvg", *r[3:]) for r in _rows(3)],
    ).filter(F.col("entity") == "ent_1")
    idx2 = index_build.build_index(ing2, dim=8).index_flat
    merged = index_build.merge_index(idx1, idx2)
    assert merged.count() == idx1.count()
    pm = (
        merged.filter(F.col("entity") == "ent_1")
        .select("entity_probmethod").distinct().collect()
    )
    assert [r[0] for r in pm] == ["HVEWAvg"]

    # finalize: only ent_0 in the uploaded set → others deleted
    uploaded = spark.createDataFrame(
        [("sd", "ent_0")], "searchdomain string, entity string"
    )
    final = index_build.finalize_session(merged, uploaded)
    assert sorted(
        r[0] for r in final.select("entity").distinct().collect()
    ) == ["ent_0"]


def test_engine_round_trip(spark):
    eng = Engine(spark, dim=8)
    eng.index_entities(_ingest(spark, _rows(5)))
    assert eng.stats().collect()[0]["n_entities"] == 5
    assert eng.models_in_use().count() == 2

    # search for a text that IS a datapoint text → that entity ranks first
    res = eng.search("document number 2 about topic 2", topn=3).collect()
    assert res[0]["entity"] == "ent_2"
    assert res[0]["rank"] == 1

    # delete + list
    eng.delete_entities(
        spark.createDataFrame([("sd", "ent_0")], "searchdomain string, entity string")
    )
    assert eng.list_entities().count() == 4
