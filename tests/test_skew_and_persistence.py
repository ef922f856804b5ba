"""Salted joins are result-identical to plain joins and actually spread a
hot key; Engine state survives a save/load round trip."""

from __future__ import annotations

from pyspark.sql import functions as F

from embeddingsearch_spark.api import Engine
from embeddingsearch_spark.operators import skew


def test_salted_join_equals_plain_join(spark):
    # 90% of fact rows share one hot key
    fact = spark.createDataFrame(
        [(1 if i % 10 else i, f"p{i}") for i in range(1000)], "k long, payload string"
    )
    dim = spark.createDataFrame(
        [(i, f"d{i}") for i in range(100)], "k long, dim_val string"
    )
    plain = fact.join(dim, ["k"]).select("k", "payload", "dim_val")
    salted = skew.salted_join(fact, dim, ["k"], n_salts=8).select(
        "k", "payload", "dim_val"
    )
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted.collect())
    )


def test_salt_spreads_hot_key(spark):
    fact = spark.createDataFrame(
        [(1, f"p{i}") for i in range(1000)], "k long, payload string"
    )
    salted = skew.salt_fact(fact, n_salts=8)
    n_distinct = salted.select(skew.SALT_COL).distinct().count()
    assert n_distinct == 8  # the single hot key now has 8 shuffle keys


INGEST_SCHEMA = (
    "searchdomain string, entity string, entity_probmethod string, "
    "attributes map<string,string>, datapoint string, dp_probmethod string, "
    "simmethod string, text string, models array<string>"
)


def test_engine_save_load_roundtrip(spark, tmp_path):
    eng = Engine(spark, dim=8)
    rows = [
        ("sd", f"e{i}", "Mean", None, "text", "Mean", "Cosine",
         f"doc {i}", ["mock:modelA"])
        for i in range(6)
    ]
    eng.index_entities(spark.createDataFrame(rows, INGEST_SCHEMA))
    before = sorted(
        map(tuple, eng.index_flat.select("entity", "text_hash").collect())
    )
    eng.save(str(tmp_path / "state"))

    eng2 = Engine(spark, dim=8)
    eng2.load(str(tmp_path / "state"))
    after = sorted(
        map(tuple, eng2.index_flat.select("entity", "text_hash").collect())
    )
    assert before == after
    assert eng2.embedding_cache.count() == eng.embedding_cache.count()
    # loaded engine searches
    assert eng2.search("doc 3").count() > 0


def test_manifest_write_and_verify(spark, tmp_path):
    """Manifest lists every shard with rows/bytes/sha256; verify is
    clean on an intact export, and flags tampering."""
    import json
    import os

    from embeddingsearch_spark import storage

    out = str(tmp_path / "export")
    df = spark.range(1000).withColumnRenamed("id", "doc_id")
    storage.write_training_shards(df, out, n_shards=4)
    m = storage.write_manifest(spark, out)
    assert m["total_rows"] == 1000 and m["n_files"] == 4
    on_disk = json.load(open(os.path.join(out, "_manifest.json")))
    assert on_disk["total_rows"] == 1000
    assert storage.verify_manifest(out) == []
    # tamper: truncate one shard
    victim = os.path.join(out, m["files"][0]["file"])
    with open(victim, "r+b") as f:
        f.truncate(10)
    problems = storage.verify_manifest(out)
    assert problems and "size mismatch" in problems[0]
