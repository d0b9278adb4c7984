"""Distributed PCA: exact-integer moment accumulation, numpy parity,
partitioning invariance, projection isometry."""

import random

import numpy as np
import pytest
from pyspark.sql import Row

from tdataframe_spark.ops.pca import PCA_QUANT, pca_project, pca_train


def _emb(spark, n=80, dim=6, seed=5):
    rng = random.Random(seed)
    rows = [
        Row(
            vec_id=i,
            # anisotropic: per-axis spread j+1 keeps eigenvalues distinct
            embedding=[rng.gauss(0.5 * j, j + 1.0) for j in range(dim)],
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows), rows


def _half_up(a):
    return np.sign(a) * np.floor(np.abs(a) * PCA_QUANT + 0.5)


def test_pca_train_matches_numpy_reference(spark):
    """The driver-side model must equal a single-machine numpy
    recomputation from the SAME integer-quantized moments — exact, not
    approximate: identical int sums give identical covariance bits, and
    eigh on identical bits is identical."""
    df, rows = _emb(spark)
    model = pca_train(df, "embedding", n_components=4)

    a = _half_up(np.array([r.embedding for r in rows], dtype=np.float64)).astype(
        np.int64
    )
    n, d = a.shape
    s = a.sum(axis=0)
    g = a.T @ a
    q = float(PCA_QUANT)
    mean_q = s.astype(np.float64) / n
    cov = (g.astype(np.float64) / n - np.outer(mean_q, mean_q)) / (q * q)
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:4]
    comps = v[:, order].T.copy()
    for row in comps:
        j = int(np.argmax(np.abs(row)))
        if row[j] < 0:
            row *= -1

    assert model["dim"] == d and model["n"] == n
    assert model["mean"] == (mean_q / q).tolist()
    assert model["components"] == [r.tolist() for r in comps]
    assert model["explained_variance"] == [float(w[i]) for i in order]
    # structural properties: orthonormal rows, descending variance
    c = np.array(model["components"])
    assert np.allclose(c @ c.T, np.eye(4), atol=1e-9)
    ev = model["explained_variance"]
    assert all(x >= y for x, y in zip(ev, ev[1:])) and ev[0] > 0


def test_pca_partitioning_invariance(spark):
    """Integer-quantized partials commute exactly: the model must be
    bit-identical whatever the partitioning (the determinism contract)."""
    df, _ = _emb(spark, n=120, dim=5, seed=11)
    m1 = pca_train(df.repartition(3), "embedding", n_components=3)
    m2 = pca_train(df.repartition(11), "embedding", n_components=3)
    assert m1 == m2


def test_pca_project_full_rank_isometry(spark):
    """At n_components == dim the projection is an orthogonal change of
    basis of the centered data: pairwise distances are preserved and the
    per-component projection variance equals the eigenvalue."""
    df, rows = _emb(spark, n=60, dim=4, seed=2)
    model = pca_train(df, "embedding", n_components=4)
    out = {
        r["vec_id"]: np.array(r["pca"])
        for r in pca_project(df, model, "vec_id", "embedding").collect()
    }
    x = {r.vec_id: np.array(r.embedding) for r in rows}
    ids = sorted(out)
    for a, b in [(ids[0], ids[1]), (ids[2], ids[10]), (ids[5], ids[40])]:
        assert np.linalg.norm(out[a] - out[b]) == pytest.approx(
            np.linalg.norm(x[a] - x[b]), abs=1e-6
        )
    p = np.array([out[i] for i in ids])
    var = ((p - p.mean(axis=0)) ** 2).mean(axis=0)
    # quantization perturbs the 7th digit; eigenvalues are O(1..16)
    assert np.allclose(var, model["explained_variance"], rtol=1e-4)


def test_pca_rejects_bad_vectors(spark):
    from pyspark.sql import functions as F

    df, _ = _emb(spark, n=10, dim=3, seed=1)
    bad = df.unionByName(
        spark.createDataFrame(
            [Row(vec_id=999, embedding=[1.0, 2.0])]
        )
    )
    # the ragged-row check rides the moments pass → surfaces wrapped from
    # the Arrow worker, not as a driver-side ValueError
    with pytest.raises(Exception, match="non-3-dim"):
        pca_train(bad, "embedding", n_components=2)
    model = pca_train(df, "embedding", n_components=2)
    with pytest.raises(Exception, match="pca_project"):
        pca_project(bad, model, "vec_id", "embedding").collect()
    # a too-greedy component count is refused
    with pytest.raises(ValueError, match="n_components"):
        pca_train(df, "embedding", n_components=7)
