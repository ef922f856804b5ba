"""SQ8 scalar quantization: round-trip error bound, zero-span
dimensions, recall against exact brute force, and the federated
routing contract."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from embeddingsearch_spark.operators import ann as ann_ops
from embeddingsearch_spark.operators import sq


def _vecs(spark, dim=12, n=80, constant_dim=True):
    rng = np.random.default_rng(31)
    rows = []
    for i in range(n):
        v = [float(x) for x in rng.normal(size=dim)]
        if constant_dim:
            v[3] = 1.25  # zero-span dimension
        rows.append((i, v, ("acme", "globex")[i % 2]))
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, source string"
    ).cache()


def test_roundtrip_error_bounded_and_zero_span_exact(spark):
    """Every dequantized value is within span/510 of the original
    (half a quantization step), and a constant dimension reconstructs
    exactly."""
    emb = _vecs(spark)
    stats = sq.sq8_stats(emb, partition_col="source")
    codes = sq.sq8_encode(emb, stats, partition_col="source")
    deq = sq.sq8_dequantize(codes, stats, partition_col="source")
    orig = {r["vec_id"]: r["embedding"] for r in emb.collect()}
    spans = {
        r["source"]: r["spans"] for r in stats.collect()
    }  # bounded: one row per collection
    for r in deq.collect():
        sp = spans[r["source"]]
        for d, (got, want) in enumerate(
            zip(r["embedding"], orig[r["vec_id"]])
        ):
            assert abs(got - want) <= sp[d] / 510 + 1e-12, (
                r["vec_id"], d, got, want, sp[d]
            )
            if d == 3:
                assert got == want == 1.25


def test_codes_in_range_and_extremes_hit_bounds(spark):
    emb = _vecs(spark, constant_dim=False)
    stats = sq.sq8_stats(emb, partition_col="source")
    codes = sq.sq8_encode(emb, stats, partition_col="source")
    flat = codes.select(F.explode("codes").alias("c"))
    lo, hi = flat.agg(F.min("c"), F.max("c")).collect()[0]
    assert lo == 0 and hi == 255  # min/max of each dim map to bounds


def test_sq8_topk_high_recall_vs_exact(spark):
    """8-bit quantization keeps cosine ranks almost everywhere: mean
    overlap@10 with the exact brute force stays high on random
    vectors."""
    emb = _vecs(spark, constant_dim=False)
    flat = emb.select("vec_id", "embedding")
    qs = flat.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    stats = sq.sq8_stats(flat)
    codes = sq.sq8_encode(flat, stats)
    got = sq.sq8_topk(codes, stats, qs, k=10)
    want = ann_ops.brute_force_topk(flat, qs, k=10)
    g = {}
    for r in got.collect():
        g.setdefault(r["query_id"], set()).add(r["vec_id"])
    overlaps = []
    for r in want.collect():
        overlaps.append(r["vec_id"] in g[r["query_id"]])
    assert sum(overlaps) / len(overlaps) >= 0.9, sum(overlaps)


def test_federated_topk_routes_and_isolates(spark):
    """A routed query scans only its own collection's codes — the
    cross-tenant perfect match never appears (the federated serve
    contract, on the compressed column)."""
    emb = _vecs(spark, constant_dim=False)
    clone = emb.filter(F.col("vec_id") == 0).select(
        (F.col("vec_id") + 5000).alias("vec_id"),
        "embedding",
        F.lit("globex").alias("source"),
    )
    two = emb.unionByName(clone)
    stats = sq.sq8_stats(two, partition_col="source")
    codes = sq.sq8_encode(two, stats, partition_col="source")
    qs = two.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    route = spark.createDataFrame(
        [(0, "acme")], "query_id long, source string"
    )
    got = sq.sq8_topk(
        codes, stats, qs, route, k=10, partition_col="source"
    )
    ids = {r["vec_id"] for r in got.collect()}
    assert 5000 not in ids and 0 in ids
    assert all(i % 2 == 0 for i in ids)  # acme ids only
