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


def test_pca_composes_with_persisted_ivf(spark, tmp_path):
    """The pre-ANN reduction claim end-to-end: project to k dims, build
    the persisted IVF index over projections, query it.  With n_probe =
    n_centroids the probe is exhaustive, so IVF top-k must EQUAL brute
    -force top-k in projected space."""
    from hedera_etl_spark.functions import cosine
    from hedera_etl_spark.operators.vectorindex import IVFIndex
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    rows, emb = _corpus(spark, n=80)
    k_dims, n_cent, topk = 3, 4, 5
    comps, _ = pca_components(emb, DIMS, k=k_dims)
    proj = pca_project(emb, comps).select(
        "vec_id", F.col("proj").cast("array<float>").alias("embedding")
    )
    idx = IVFIndex.build(
        spark, str(tmp_path / "ivf"), proj, n_centroids=n_cent, dims=k_dims
    )
    queries = proj.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    got = {
        (r.query_id, r.rank): r.neighbor_id
        for r in idx.query(queries, k=topk, n_probe=n_cent).collect()
    }
    # brute force in projected space
    w = W.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("vec_id"))
    brute = {
        (r.query_id, r.rank): r.vec_id
        for r in queries.crossJoin(proj)
        .filter(F.col("query_id") != F.col("vec_id"))
        .withColumn("cos", cosine(F.col("qvec"), F.col("embedding"), k_dims))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= topk)
        .collect()
    }
    assert got == brute


def test_null_and_short_vectors_fail_loud(spark):
    """r7 second-review finding: SUM silently skips rows COUNT(*)
    includes, biasing covariance — every consumer must raise instead.
    NULL vectors trip the n_valid guard (element_at(NULL) is silently
    NULL); short vectors are already loud under ANSI (element_at OOB
    throws before the guard) — both paths asserted."""
    nulls = spark.createDataFrame(
        [(1, [1.0] * DIMS), (2, None)],
        "vec_id long, embedding array<float>",
    )
    with pytest.raises(ValueError, match="null/short"):
        pca_components(nulls, DIMS, k=1)
    with pytest.raises(Exception, match="null/short"):
        covariance_matrix(nulls, DIMS).collect()
    short = spark.createDataFrame(
        [(1, [1.0] * DIMS), (3, [1.0] * (DIMS - 1))],
        "vec_id long, embedding array<float>",
    )
    with pytest.raises(Exception):  # ANSI ArrayIndexOutOfBounds — loud
        covariance_matrix(short, DIMS).collect()


def test_dims_guard(spark):
    _, emb = _corpus(spark, n=5)
    with pytest.raises(ValueError, match="dims"):
        pca_components(emb, 129, k=1)


def test_project_honors_id_col(spark):
    df = spark.createDataFrame(
        [(7, [1.0] * DIMS)], "my_id long, embedding array<float>"
    )
    comps, _ = pca_components(
        spark.createDataFrame(
            [(1, [float(i) for i in range(DIMS)]), (2, [float(-i) for i in range(DIMS)])],
            "my_id long, embedding array<float>",
        ),
        DIMS, k=1,
    )
    out = pca_project(df, comps, id_col="my_id")
    assert out.columns == ["my_id", "proj"]
