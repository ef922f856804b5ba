"""Sequence packing (operators/packing.py): greedy first-fit semantics,
budget respect, oversized docs, and fill stats."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from embeddingsearch_spark.operators import packing


def _pack(spark, rows, budget, n_shards=1):
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    out = packing.pack_sequences(
        df, budget=budget, n_shards=n_shards
    ).collect()
    return sorted((r["doc_id"], r["pack_id"], r["pack_pos"]) for r in out)


def test_greedy_first_fit_single_shard(spark):
    # budget 10: [4,4] fill pack0; 5 overflows -> pack1; [5,5] fills pack1;
    # wait: 5 then 5 = 10 exactly -> same pack; 9 -> pack2
    rows = [(1, 4), (2, 4), (3, 5), (4, 5), (5, 9)]
    got = _pack(spark, rows, budget=10)
    packs = {d: p for d, p, _ in got}
    assert packs[1] == packs[2] != packs[3]
    assert packs[3] == packs[4] != packs[5]
    pos = {d: x for d, _, x in got}
    assert (pos[1], pos[2], pos[3], pos[4], pos[5]) == (0, 1, 0, 1, 0)


def test_budget_never_exceeded_except_oversized(spark):
    rows = [(i, 7) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    packed = packing.pack_sequences(df, budget=20, n_shards=4)
    fills = packed.groupBy("pack_id").agg(F.sum("n_tokens").alias("f"))
    assert fills.filter(F.col("f") > 20).count() == 0


def test_oversized_doc_sits_alone(spark):
    rows = [(1, 3), (2, 50), (3, 3)]
    got = _pack(spark, rows, budget=10)
    packs = {d: p for d, p, _ in got}
    # 50 > budget: closes pack0, sits alone, next doc opens a new pack
    assert packs[1] != packs[2] and packs[2] != packs[3]


def test_pack_ids_globally_unique_across_shards(spark):
    rows = [(i, 5) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    packed = packing.pack_sequences(df, budget=10, n_shards=8)
    per_pack_shards = packed.groupBy("pack_id").agg(
        F.countDistinct("shard").alias("ns")
    )
    assert per_pack_shards.filter(F.col("ns") > 1).count() == 0


def test_pack_stats_fill(spark):
    rows = [(1, 10), (2, 10)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    packed = packing.pack_sequences(df, budget=10, n_shards=1)
    stats = packing.pack_stats(packed, budget=10).collect()
    total_docs = sum(r["n_docs"] for r in stats)
    assert total_docs == 2
    for r in stats:
        assert r["avg_fill"] == 1.0


def test_rejects_bad_budget(spark):
    df = spark.createDataFrame([(1, 1)], "doc_id long, n_tokens long")
    with pytest.raises(ValueError):
        packing.pack_sequences(df, budget=0)


def test_length_bucket_batches(spark):
    from embeddingsearch_spark.operators.packing import length_bucket_batches

    df = spark.createDataFrame(
        [(i, 10 + (i % 3)) for i in range(100)]  # all in bucket 4 (log2 ~3.5)
        + [(100 + i, 100) for i in range(10)],   # bucket 7
        "doc_id long, n_tokens long",
    )
    out = length_bucket_batches(df, batch_size=8, n_shards=2).collect()
    rows = {r["doc_id"]: r for r in out}
    assert len(rows) == 110
    # same bucket for similar lengths; different for the 100-token docs
    assert rows[0]["bucket"] == rows[50]["bucket"] == 4
    assert rows[105]["bucket"] == 7
    # batch positions are dense within each (bucket, shard, batch)
    from collections import defaultdict

    by_batch = defaultdict(list)
    for r in out:
        by_batch[r["batch_id"]].append(r["batch_pos"])
    for bid, poss in by_batch.items():
        assert sorted(poss) == list(range(len(poss))), bid
        assert len(poss) <= 8
    # determinism: same input -> identical assignment
    again = {
        r["doc_id"]: r["batch_id"]
        for r in length_bucket_batches(df, batch_size=8, n_shards=2).collect()
    }
    assert again == {r["doc_id"]: r["batch_id"] for r in out}
