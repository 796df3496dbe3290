"""Embedding covariance / PCA vs NumPy on the quantized lattice."""

import numpy as np
import pytest

from osmflat_rs_spark.operators.pca import embedding_covariance, pca_components, pca_project


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.default_rng(11)
    # anisotropic cloud: two dominant directions in d=8
    d, n = 8, 300
    basis = rng.normal(size=(d, d))
    scale = np.array([5.0, 3.0, 1.0, 0.5, 0.2, 0.1, 0.05, 0.02])
    x = (rng.normal(size=(n, d)) * scale) @ basis.T
    x = (x / 10.0).astype(np.float32)
    df = spark.createDataFrame(
        [(i, x[i].tolist()) for i in range(n)], "vec_id long, embedding array<float>"
    )
    return df, x


def test_covariance_matches_numpy_on_lattice(spark, emb):
    df, x = emb
    got = {(r["i"], r["j"]): (r["n"], r["cov"]) for r in embedding_covariance(df).collect()}
    v = np.floor(x.astype(np.float64) * 1e6 + 0.5)
    cov = np.cov(v, rowvar=False, ddof=1) * 1e-12
    assert len(got) == 8 * 9 // 2
    for (i, j), (n, c) in got.items():
        assert n == x.shape[0]
        assert c == pytest.approx(cov[i, j], rel=1e-12, abs=1e-15), (i, j)


def test_covariance_partition_invariant(spark, emb):
    df, _ = emb
    a = {(r["i"], r["j"]): r["cov"] for r in embedding_covariance(df.repartition(1)).collect()}
    b = {(r["i"], r["j"]): r["cov"] for r in embedding_covariance(df.repartition(7)).collect()}
    assert a == b  # exact integer moments → bit equality is contractual here


def test_pca_projection_variance_order_and_recon(spark, emb):
    df, x = emb
    cov = embedding_covariance(df)
    vals, comps = pca_components(cov, d=8, k=4)
    assert np.all(np.diff(vals) <= 1e-15)  # descending
    assert np.allclose(comps @ comps.T, np.eye(4), atol=1e-10)  # orthonormal
    out = pca_project(df, comps)
    p = np.stack([np.array(r["pca"]) for r in out.orderBy("vec_id").collect()])
    # projected variance per component ≈ eigenvalue (same quantized contract
    # up to the mean offset: eigenvalues came from centered covariance)
    pv = np.var(p, axis=0, ddof=1)
    assert np.all(np.diff(pv) <= 1e-9)
    assert pv[0] == pytest.approx(vals[0], rel=1e-3)
    # deterministic sign: largest-|entry| coordinate positive
    for c in comps:
        assert c[np.argmax(np.abs(c))] > 0


def test_gram_overflow_guard_raises(spark):
    """ADVICE r05: huge values at a fine quant must fail loudly, not
    wrap silently in the int64 Gram accumulation."""
    import pandas as pd

    big = spark.createDataFrame(
        pd.DataFrame({"vec_id": [0, 1], "embedding": [[1e9, 0.0], [0.0, 1e9]]}),
        schema="vec_id long, embedding array<double>",
    )
    with pytest.raises(Exception, match="overflow"):
        embedding_covariance(big, quant=1e-6).collect()
