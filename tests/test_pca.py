"""Distributed PCA: gram-pass exactness vs numpy, eigenvector quality
vs numpy.linalg.eigh, and the replay-rounding contract."""

from __future__ import annotations

import numpy as np
import pytest

from prajna_spark.pipeline.pca import gram_stats, pca_top_component


def _vectors(spark, X):
    rows = [(row.tolist(),) for row in X]
    return spark.createDataFrame(rows, "e array<double>")


def test_gram_pass_matches_numpy(spark):
    rng = np.random.default_rng(7)
    X = rng.normal(size=(200, 6))
    out = gram_stats(_vectors(spark, X), "e", 6).collect()
    g = np.zeros((6, 6))
    s = np.zeros(6)
    n = 0.0
    for r in out:
        if r["i"] == 0:
            n = r["val"]
        elif r["j"] == 0:
            s[r["i"] - 1] = r["val"]
        else:
            g[r["i"] - 1, r["j"] - 1] = r["val"]
    assert n == 200.0
    assert np.allclose(g, X.T @ X, atol=1e-9)
    assert np.allclose(s, X.sum(axis=0), atol=1e-10)


def test_power_iteration_finds_dominant_eigenvector(spark):
    rng = np.random.default_rng(11)
    # strongly anisotropic cloud: dominant direction d
    d = rng.normal(size=8)
    d /= np.linalg.norm(d)
    X = rng.normal(size=(500, 8)) * 0.2 + np.outer(rng.normal(size=500) * 3, d)
    res = pca_top_component(_vectors(spark, X), "e", 8, n_iter=12)
    rows = sorted(res.collect(), key=lambda r: r["dim_idx"])
    v = np.array([r["loading"] for r in rows])
    lam = rows[0]["eigenvalue"]

    Xc = X - X.mean(axis=0)
    cov = Xc.T @ Xc / len(X)
    evals, evecs = np.linalg.eigh(cov)
    top = evecs[:, -1]
    assert abs(abs(v @ top) - 1.0) < 1e-3  # aligned up to sign
    assert abs(lam - evals[-1]) < 1e-2 * evals[-1]
    assert abs(np.linalg.norm(v) - 1.0) < 1e-6


def test_loadings_are_rounded_to_contract(spark):
    rng = np.random.default_rng(3)
    X = rng.normal(size=(50, 4))
    rows = pca_top_component(_vectors(spark, X), "e", 4, n_iter=4).collect()
    for r in rows:
        assert r["loading"] == pytest.approx(round(r["loading"], 6), abs=0)
