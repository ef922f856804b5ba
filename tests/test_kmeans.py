"""K-means coarse quantizer: Spark Lloyd iterations match a NumPy mirror
with the same deterministic init and cosine assignment."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from embeddingsearch_spark import tables
from embeddingsearch_spark.constants import ROUND_DIGITS
from embeddingsearch_spark.operators import ann as ann_ops

SF = "/root/testdata/sf0.001"


def _np_kmeans(V, ids, k, iters):
    order = np.argsort(ids)
    C = V[order[:k]].astype(np.float64).copy()
    for _ in range(iters):
        vn = np.linalg.norm(V, axis=1)
        cn = np.linalg.norm(C, axis=1)
        denom = vn[:, None] * cn[None, :]
        with np.errstate(divide="ignore", invalid="ignore"):
            raw = np.where(denom == 0.0, 0.0, (V @ C.T) / denom)
        sim = np.round((raw + 1.0) / 2.0, ROUND_DIGITS)
        # argmax, ties -> smallest centroid id
        assign = np.array(
            [int(np.flatnonzero(row == row.max())[0]) for row in sim]
        )
        for c in range(k):
            members = V[assign == c]
            if len(members):
                C[c] = members.mean(axis=0)
    return C, assign


def test_kmeans_matches_numpy(spark):
    emb = tables.load(spark, SF, "embeddings")
    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r.vec_id for r in rows])
    V = np.array([list(r.embedding) for r in rows], dtype=np.float64)

    k, iters = 4, 2
    cents = ann_ops.kmeans_centroids(emb, k=k, iters=iters).collect()
    got = {r.centroid_id: np.array(r.embedding) for r in cents}

    C_exp, _ = _np_kmeans(V, ids, k, iters)
    assert set(got) == set(range(k))
    for c in range(k):
        assert got[c] == pytest.approx(C_exp[c], rel=1e-9, abs=1e-9)


def test_kmeans_feeds_ivf(spark):
    emb = tables.load(spark, SF, "embeddings")
    cents = ann_ops.kmeans_centroids(emb, k=4, iters=2)
    assigned = ann_ops.assign_centroids(emb, cents)
    qs = emb.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    topk = ann_ops.ivf_topk(assigned, cents, qs, k=5, nprobe=2)
    rows = topk.collect()
    assert len(rows) > 0
    assert all(r.rank <= 5 for r in rows)
