"""Embedding PCA (operators/embedpca.py): covariance exactness vs
numpy, eigendecomposition properties, projection correctness."""

import math
import random

import numpy as np
import pytest

from hedera_etl_spark.operators.embedpca import (
    covariance_matrix,
    pca_components,
    pca_project,
)

DIMS = 6


def _corpus(spark, n=200, seed=3):
    rng = random.Random(seed)
    # anisotropic cloud: dim0 carries most variance, dim1 some, rest noise
    rows = []
    for i in range(n):
        base = rng.gauss(0, 1)
        v = [
            3.0 * base,
            1.5 * rng.gauss(0, 1) + 0.5 * base,
            *[0.1 * rng.gauss(0, 1) for _ in range(DIMS - 2)],
        ]
        rows.append((i, [float(np.float32(x)) for x in v]))
    return rows, spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_covariance_matches_numpy(spark):
    rows, emb = _corpus(spark)
    X = np.array([r[1] for r in rows], dtype=np.float64)
    expected = np.cov(X, rowvar=False, bias=True)  # population covariance
    got = {(r.i, r.j): r.cov for r in covariance_matrix(emb, DIMS).collect()}
    for i in range(DIMS):
        for j in range(i, DIMS):
            assert got[(i + 1, j + 1)] == pytest.approx(
                expected[i][j], abs=1e-9
            ), (i, j)


def test_components_match_numpy_eigh(spark):
    rows, emb = _corpus(spark)
    X = np.array([r[1] for r in rows], dtype=np.float64)
    cov = np.cov(X, rowvar=False, bias=True)
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1]

    comps, evs = pca_components(emb, DIMS, k=3)
    # explained variances descend and match numpy's top eigenvalues
    assert evs == sorted(evs, reverse=True)
    for got_ev, idx in zip(evs, order[:3]):
        assert got_ev == pytest.approx(float(vals[idx]), rel=1e-6)
    # components match numpy's eigenvectors up to the pinned sign
    for comp, idx in zip(comps, order[:3]):
        v = vecs[:, idx]
        pivot = int(np.argmax(np.abs(v)))
        if v[pivot] < 0:
            v = -v
        assert np.allclose(comp, v, atol=1e-6)
    # orthonormal basis
    C = np.array(comps)
    assert np.allclose(C @ C.T, np.eye(3), atol=1e-9)


def test_projection_matches_matrix_product(spark):
    rows, emb = _corpus(spark, n=50)
    comps, _ = pca_components(emb, DIMS, k=2)
    got = {r.vec_id: list(r.proj) for r in pca_project(emb, comps).collect()}
    C = np.array(comps)
    for vid, vec in rows:
        assert np.allclose(got[vid], C @ np.array(vec), atol=1e-9)


def test_variance_concentrates_in_leading_component(spark):
    rows, emb = _corpus(spark)
    _, evs = pca_components(emb, DIMS, k=DIMS)
    assert evs[0] > 0.5 * sum(evs)  # dim0 dominates by construction
    assert all(ev >= -1e-12 for ev in evs)  # PSD


def test_validation(spark):
    _, emb = _corpus(spark, n=5)
    with pytest.raises(ValueError):
        pca_components(emb, DIMS, k=0)
    with pytest.raises(ValueError):
        pca_components(emb, DIMS, k=DIMS + 1)
    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    with pytest.raises(ValueError, match="empty"):
        pca_components(empty, DIMS, k=1)
