"""PCA over embeddings: distributed Gramian vs numpy.cov, eigen-stage
variance invariants, whitening, projection round-trip.
"""

from __future__ import annotations

import numpy as np
import pytest

from embeddingsearch_spark.operators import pca


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.default_rng(11)
    # anisotropic cloud: variance concentrated in a few directions
    basis = rng.normal(size=(12, 12))
    scales = np.array([8, 5, 3] + [0.5] * 9)
    rows = [
        (i, [float(x) for x in basis.T @ (rng.normal(size=12) * scales)])
        for i in range(400)
    ]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).cache()


def _np_data(emb):
    return np.array([r.embedding for r in emb.orderBy("vec_id").collect()])


def test_gram_matches_numpy_cov(spark, emb):
    X = _np_data(emb)
    C = np.cov(X, rowvar=False, ddof=1)
    got = {(r.i, r.j): r.v for r in pca.gram_upper(emb).collect()}
    assert len(got) == 12 * 13 // 2
    for (i, j), v in got.items():
        assert i <= j
        assert v == pytest.approx(C[i, j], abs=2e-6)


def test_components_capture_variance_in_order(emb):
    means, comps, ev = pca.pca_components(emb, k=4)
    assert comps.shape == (4, 12)
    assert list(ev) == sorted(ev, reverse=True)
    # top-3 planted directions dominate: explained >> remaining axes
    X = _np_data(emb)
    total_var = np.trace(np.cov(X, rowvar=False, ddof=1))
    assert ev[:3].sum() / total_var > 0.9
    # components are orthonormal
    assert np.allclose(comps @ comps.T, np.eye(4), atol=1e-8)


def test_projection_variance_matches_eigenvalues(emb):
    means, comps, ev = pca.pca_components(emb, k=3)
    proj = pca.project(emb, means, comps)
    P = np.array([r.proj for r in proj.orderBy("vec_id").collect()])
    assert P.shape == (400, 3)
    var = P.var(axis=0, ddof=1)
    assert np.allclose(var, ev, rtol=1e-3)


def test_whitened_projection_unit_variance(emb):
    means, comps, ev = pca.pca_components(emb, k=3)
    proj = pca.project(emb, means, comps, whiten_by=ev)
    P = np.array([r.proj for r in proj.orderBy("vec_id").collect()])
    assert np.allclose(P.var(axis=0, ddof=1), 1.0, rtol=1e-3)


def test_projection_preserves_neighborhoods(emb):
    """Reduced-space cosine top-1 (excluding self) agrees with full-space
    for most queries — the reason to run ANN on the projection."""
    X = _np_data(emb)
    means, comps, ev = pca.pca_components(emb, k=6)
    P = np.array([r.proj for r in pca.project(emb, means, comps)
                  .orderBy("vec_id").collect()])

    def top1(M):
        Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
        S = Mn @ Mn.T
        np.fill_diagonal(S, -2)
        return S.argmax(axis=1)

    agree = (top1(X[:100]) == top1(P[:100])).mean()
    assert agree > 0.7, agree
