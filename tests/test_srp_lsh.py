"""SRP-LSH near-dup: exact-verify precision (emitted ⊆ true pairs),
using the suite query's 16/4 config (the weak-threshold operating point;
the 64/8 default targets real near-dup corpora — see operator docstring),
useful recall on the testdata, deterministic hyperplanes, and a plan
without a cartesian product."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from embeddingsearch_spark import tables
from embeddingsearch_spark.operators.ann import srp_cosine_pairs, srp_hyperplanes

THRESHOLD = 0.65  # remapped (raw+1)/2; the testdata's near-dup band


@pytest.fixture(scope="module")
def truth(spark, sf_dir):
    emb = tables.load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    rows = emb.collect()
    V = np.array([np.asarray(r["embedding"], dtype=np.float64) for r in rows])
    ids = [r["vec_id"] for r in rows]
    n = V / np.linalg.norm(V, axis=1, keepdims=True)
    sim = np.round((n @ n.T + 1.0) / 2.0, 6)
    pairs = {
        (ids[i], ids[j])
        for i in range(len(ids))
        for j in range(len(ids))
        if ids[i] < ids[j] and sim[i, j] >= THRESHOLD
    }
    return emb, pairs


def test_precision_and_recall(truth):
    emb, true_pairs = truth
    got = {
        (r["id_a"], r["id_b"])
        for r in srp_cosine_pairs(emb, n_bits=16, bands=4, threshold=THRESHOLD).collect()
    }
    assert got <= true_pairs  # exact verify ⇒ no false positives
    # Deterministic on the fixed testdata. The testdata's "near-dups" are
    # weak (max raw cosine 0.48 ⇒ θ≈61°): SRP theory gives per-bit
    # collision 1−θ/π ≈ 0.6, any-of-4-bands ≈ 0.45 at the threshold
    # boundary — measured 0.477 overall, rising with similarity (0.55 in
    # the [0.70,0.75) band). True near-dup corpora (raw ≥ 0.9) collide at
    # ≈ 0.95 with the same 16/4 config.
    assert len(true_pairs) > 0
    assert len(got) / len(true_pairs) >= 0.45


def test_hyperplanes_deterministic():
    a = srp_hyperplanes(8, 4)
    b = srp_hyperplanes(8, 4)
    assert (a == b).all()
    assert set(np.unique(a)) == {-1.0, 1.0}
    # not degenerate: both signs appear in every hyperplane
    assert (np.abs(a.sum(axis=1)) < 8).all()


def test_auto_config_scales():
    from embeddingsearch_spark.operators.ann import srp_config_for

    small_bits, small_bands = srp_config_for(500)
    big_bits, big_bands = srp_config_for(100_000_000)
    # bits-per-band grows with log2(n) (bucket sparsity), bands with it
    # (recall compensation)
    assert big_bits // big_bands > small_bits // small_bands
    assert big_bands > small_bands
    for n in (2, 500, 10**6, 10**9):
        bits, bands = srp_config_for(n)
        assert bits % bands == 0 and bands >= 2


def test_auto_config_rejects_partial_override(truth):
    emb, _ = truth
    with pytest.raises(ValueError):
        srp_cosine_pairs(emb, n_bits=32)


def test_no_cartesian_plan(truth):
    emb, _ = truth
    plan = (
        srp_cosine_pairs(emb)._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_cross_pairs_cross_side_only_and_recall(spark):
    """srp_cross_pairs returns only train x eval pairs and finds planted
    eval leaks (identical vectors always share every bucket)."""
    import numpy as np
    from pyspark.sql import functions as F

    from embeddingsearch_spark.operators import ann

    rng = np.random.default_rng(3)
    base = [[float(x) for x in rng.normal(size=16)] for _ in range(60)]
    train = spark.createDataFrame(
        [(i, v) for i, v in enumerate(base)],
        "vec_id long, embedding array<double>",
    )
    # eval: 5 exact leaks of train vectors + 20 fresh
    ev_rows = [(100 + j, base[j * 7]) for j in range(5)] + [
        (200 + j, [float(x) for x in rng.normal(size=16)]) for j in range(20)
    ]
    ev = spark.createDataFrame(
        ev_rows, "vec_id long, embedding array<double>"
    )
    out = ann.srp_cross_pairs(
        train, ev, n_bits=16, bands=4, threshold=0.99
    ).collect()
    train_ids = {r.train_id for r in out}
    eval_ids = {r.eval_id for r in out}
    assert train_ids <= set(range(60))
    assert eval_ids <= {100 + j for j in range(5)} | {200 + j for j in range(20)}
    # every planted leak found (identical vector -> cosine 1.0)
    found = {(r.train_id, r.eval_id) for r in out if r.cosine >= 0.999}
    assert {(j * 7, 100 + j) for j in range(5)} <= found


def test_multiprobe_superset_of_exact_banding(spark, sf_dir):
    """Flip 0 is the identity probe, so multi-probe candidates (and
    thus verified pairs) are a superset of the exact-banding query's;
    every extra pair still clears the exact-cosine threshold."""
    from embeddingsearch_spark import tables
    from embeddingsearch_spark.operators import ann as ann_ops

    emb = tables.load(spark, sf_dir, "embeddings")
    plain = {
        (r["id_a"], r["id_b"])
        for r in ann_ops.srp_cosine_pairs(
            emb, dim=64, n_bits=16, bands=4, threshold=0.65
        ).collect()
    }
    multi_rows = ann_ops.srp_multiprobe_pairs(
        emb, dim=64, n_bits=16, bands=4, threshold=0.65
    ).collect()
    multi = {(r["id_a"], r["id_b"]) for r in multi_rows}
    assert plain <= multi
    assert all(r["cosine"] >= 0.65 for r in multi_rows)
    assert all(a < b for a, b in multi)
