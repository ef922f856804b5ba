"""hash_split: partition-layout-independent, proportional, exhaustive,
and incremental (a row's split never depends on the rest of the data)."""

from __future__ import annotations

import pytest

from embeddingsearch_spark import tables
from embeddingsearch_spark.operators.splits import hash_split

FRACS = {"train": 0.8, "valid": 0.1, "test": 0.1}


def _assign(df):
    return {r["doc_id"]: r["split"] for r in df.collect()}


def test_stable_under_repartition(spark, sf_dir):
    docs = tables.load(spark, sf_dir, "documents").select("doc_id")
    a = _assign(hash_split(docs, "doc_id", FRACS))
    b = _assign(hash_split(docs.repartition(13), "doc_id", FRACS))
    assert a == b
    assert set(a.values()) == set(FRACS)


def test_incremental_membership(spark, sf_dir):
    # splitting a subset assigns identically to splitting the full table
    docs = tables.load(spark, sf_dir, "documents").select("doc_id")
    full = _assign(hash_split(docs, "doc_id", FRACS))
    sub = _assign(hash_split(docs.limit(100), "doc_id", FRACS))
    assert all(full[k] == v for k, v in sub.items())


def test_proportions(spark):
    ids = spark.range(20_000).withColumnRenamed("id", "doc_id")
    counts = {
        r["split"]: r["count"]
        for r in hash_split(ids, "doc_id", FRACS).groupBy("split").count().collect()
    }
    n = sum(counts.values())
    assert n == 20_000
    for name, frac in FRACS.items():
        assert counts[name] / n == pytest.approx(frac, abs=0.02)


def test_bad_fractions_rejected(spark):
    ids = spark.range(10).withColumnRenamed("id", "doc_id")
    with pytest.raises(ValueError):
        hash_split(ids, "doc_id", {"train": 0.5, "test": 0.4})
