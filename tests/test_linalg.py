"""Covariance operators: the DECIMAL-exact path and the numpy
Gram-partial scale path must agree; the matrix must be a valid
covariance (PSD, diagonal = per-dim variance)."""

from __future__ import annotations

import numpy as np

from vectolite_spark.operators.linalg import (
    embedding_covariance,
    gram_partials_covariance,
)
from vectolite_spark.schema import load_table

SF = "/root/testdata/sf0.001"


def _as_matrix(rows):
    d = max(r["dim_j"] for r in rows)
    m = np.zeros((d, d))
    for r in rows:
        m[r["dim_i"] - 1, r["dim_j"] - 1] = r["cov"]
        m[r["dim_j"] - 1, r["dim_i"] - 1] = r["cov"]
    return m


def test_exact_and_gram_paths_agree(spark):
    e = load_table(spark, SF, "embeddings")
    exact = {(r["dim_i"], r["dim_j"]): r["cov"] for r in embedding_covariance(e).collect()}
    fast = {(r["dim_i"], r["dim_j"]): r["cov"] for r in gram_partials_covariance(e).collect()}
    assert set(exact) == set(fast)
    assert max(abs(exact[k] - fast[k]) for k in exact) < 1e-6


def test_covariance_matches_numpy_reference(spark):
    e = load_table(spark, SF, "embeddings")
    vecs = np.asarray(
        [list(r["embedding"]) for r in e.select("embedding").collect()],
        dtype=np.float64,
    )
    want = np.cov(vecs, rowvar=False, bias=True)  # population (divide by n)
    got = _as_matrix(embedding_covariance(e).collect())
    assert np.max(np.abs(got - want)) < 1e-6


def test_covariance_is_psd(spark):
    e = load_table(spark, SF, "embeddings")
    m = _as_matrix(embedding_covariance(e).collect())
    evals = np.linalg.eigvalsh(m)
    assert evals.min() > -1e-6  # PSD up to the 6dp output rounding


def test_partitioning_invariance(spark):
    # the DECIMAL accumulation contract: any partitioning, same matrix
    e = load_table(spark, SF, "embeddings")
    a = {(r["dim_i"], r["dim_j"]): r["cov"] for r in embedding_covariance(e).collect()}
    b = {
        (r["dim_i"], r["dim_j"]): r["cov"]
        for r in embedding_covariance(e.repartition(13)).collect()
    }
    assert a == b


def test_pca_projection_invariants(spark):
    from vectolite_spark.operators.linalg import pca_project

    e = load_table(spark, SF, "embeddings")
    proj, explained = pca_project(e, k=4)
    mat = np.asarray([r["pca"] for r in proj.select("pca").collect()])
    assert mat.shape[1] == 4
    assert explained == sorted(explained, reverse=True)
    # component variance == eigenvalue (population), components decorrelate
    pc_cov = np.cov(mat, rowvar=False, bias=True)
    assert np.allclose(np.diag(pc_cov), explained, rtol=1e-5, atol=1e-8)
    off = pc_cov - np.diag(np.diag(pc_cov))
    assert np.max(np.abs(off)) < 1e-6
    # components are mean-centered
    assert np.max(np.abs(mat.mean(axis=0))) < 1e-9
    # matches the direct numpy projection up to per-component sign
    vecs = np.asarray(
        [list(r["embedding"]) for r in e.select("embedding").collect()],
        dtype=np.float64,
    )
    centered = vecs - vecs.mean(axis=0)
    ev, evec = np.linalg.eigh(np.cov(vecs, rowvar=False, bias=True))
    ref = centered @ evec[:, np.argsort(ev)[::-1][:4]]
    for c in range(4):
        d_same = np.max(np.abs(mat[:, c] - ref[:, c]))
        d_flip = np.max(np.abs(mat[:, c] + ref[:, c]))
        assert min(d_same, d_flip) < 1e-6


def test_negative_zero_is_normalized(spark):
    # r5 driver red row: ROUND of a tiny negative covariance yields IEEE
    # -0.0, whose sign bit survives into an exact value-hash comparison
    # even though -0.0 == 0.0. cov(x, y) here is exactly -eps^2/2 -> a
    # ~-5e-9 cell that 6dp rounding maps to (signed) zero.
    import math

    eps = 1e-4
    df = spark.createDataFrame(
        [(1, [1.0, 1.0 + eps, 1.0 - eps]), (2, [1.0, 1.0 - eps, 1.0 + eps])],
        "vec_id int, embedding array<float>",
    )
    rows = embedding_covariance(df).collect()
    cell = {(r["dim_i"], r["dim_j"]): r["cov"] for r in rows}[(2, 3)]
    assert cell == 0.0
    assert math.copysign(1.0, cell) == 1.0, "negative zero leaked"
    assert not any(repr(r["cov"]) == "-0.0" for r in rows)
