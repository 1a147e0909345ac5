"""PCA / whitening (operators/pca.py): numpy-twin differentials,
variance ordering, reconstruction, whitening, partitioning
determinism of the sample path, exact-path agreement, and the honest
boundaries (degenerate whitening, ragged dims, validation)."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from tableone_pyspark_spark.operators.pca import (
    fit_pca,
    pca_project,
    pca_project_py,
)

EMB = "/root/testdata/sf0.001/embeddings.parquet"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(EMB)


@pytest.fixture(scope="module")
def model(spark, emb):
    # train_limit covers the whole 500-row table -> the "sample" IS
    # the corpus, so moments are exact for the assertions below
    return fit_pca(emb, k=8, train_limit=100_000)


def _X(emb):
    rows = emb.select("vec_id", F.col("embedding").cast("array<double>")) \
              .orderBy("vec_id").collect()
    return np.array([r[1] for r in rows]), [r[0] for r in rows]


def test_model_shape_and_variance_order(emb, model):
    X, _ = _X(emb)
    d = X.shape[1]
    assert model.mean.shape == (d,)
    assert model.components.shape == (d, 8)
    assert model.eigvals.shape == (8,)
    # variance-descending, non-negative
    assert all(
        model.eigvals[i] >= model.eigvals[i + 1] - 1e-12 for i in range(7)
    )
    assert model.eigvals[-1] >= -1e-9
    # orthonormal axes
    VtV = model.components.T @ model.components
    assert np.allclose(VtV, np.eye(8), atol=1e-10)
    # sign convention: largest-|entry| coordinate positive
    for j in range(8):
        i = int(np.argmax(np.abs(model.components[:, j])))
        assert model.components[i, j] > 0


def test_projected_variances_match_eigvals(emb, model):
    X, _ = _X(emb)
    Y = (X - model.mean) @ model.components
    assert np.allclose(Y.var(axis=0), model.eigvals, rtol=1e-8)
    # whitened variances are 1
    Yw = Y / np.sqrt(model.eigvals)
    assert np.allclose(Yw.var(axis=0), 1.0, rtol=1e-8)


def test_project_matches_python_twin(spark, emb, model):
    # since the r12 per-batch GEMM the kernel's low bits depend on the
    # Arrow batch size (BLAS picks different small-n kernels), so the
    # twin pin carries an explicit ~1 ulp-scale bound instead of the
    # old abs=0.0 (measured seam ~1e-16; the opq fold-vs-BLAS class).
    # The repartition(7) arm pins that odd batch boundaries stay inside
    # the same bound.
    for frame in (emb, emb.repartition(7)):
        got = {
            r["id"]: r["y"]
            for r in pca_project(frame, model, whiten=True).collect()
        }
        pdf = emb.select("vec_id", "embedding").collect()
        for r in pdf:
            want = pca_project_py(list(r["embedding"]), model, whiten=True)
            assert got[r["vec_id"]] == pytest.approx(want, abs=1e-12), (
                r["vec_id"]
            )


def test_full_rank_reconstruction(emb, spark):
    X, _ = _X(emb)
    m = fit_pca(emb, train_limit=100_000)  # k = d
    Y = (X - m.mean) @ m.components
    back = Y @ m.components.T + m.mean
    assert np.allclose(back, X, atol=1e-9)


def test_sample_path_partitioning_invariant(emb):
    a = fit_pca(emb, k=4, train_limit=100_000)
    b = fit_pca(emb.repartition(17), k=4, train_limit=100_000)
    # bit-identical: the ordered driver sample is the same rows in the
    # same order on any layout (the exact-replay oracle contract)
    assert np.array_equal(a.mean, b.mean)
    assert np.array_equal(a.components, b.components)
    assert np.array_equal(a.eigvals, b.eigvals)


def test_exact_path_agrees_with_full_sample(emb):
    a = fit_pca(emb, k=4, train_limit=100_000)
    b = fit_pca(emb, k=4, exact=True)
    assert np.allclose(a.mean, b.mean, atol=1e-10)
    assert np.allclose(a.eigvals, b.eigvals, rtol=1e-8)
    # eigenvectors agree up to float noise (sign already fixed)
    assert np.allclose(np.abs(a.components), np.abs(b.components), atol=1e-6)


def test_null_vectors(spark, model):
    df = spark.createDataFrame(
        [(1, [0.0] * 64), (2, None)],
        "vec_id long, embedding array<double>",
    )
    got = {r["id"]: r["y"] for r in pca_project(df, model).collect()}
    assert got[2] is None
    assert got[1] == pytest.approx(
        pca_project_py([0.0] * 64, model), abs=1e-12
    )
    # NULL vectors are dropped at fit time
    m = fit_pca(
        df.union(
            spark.createDataFrame(
                [(3, [1.0] * 64)], "vec_id long, embedding array<double>"
            )
        ),
        k=1,
    )
    assert m.components.shape == (64, 1)


def test_degenerate_whitening_refused(spark):
    # all points on a line -> second eigval ~ 0 -> whitening at k=2
    # must refuse instead of exploding an axis
    rows = [(i, [float(i), 2.0 * i]) for i in range(10)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    m = fit_pca(df, k=2)
    with pytest.raises(ValueError, match="whitening"):
        pca_project(df, m, whiten=True).collect()
    # and succeeds once the axis is dropped or eps is supplied
    assert pca_project(df, fit_pca(df, k=1), whiten=True).count() == 10
    assert pca_project(df, m, whiten=True, eps=1e-6).count() == 10


def test_validation(spark, emb):
    with pytest.raises(ValueError, match="k must be"):
        fit_pca(emb, k=0)
    with pytest.raises(ValueError, match="k must be"):
        fit_pca(emb, k=65)
    with pytest.raises(ValueError, match="train_limit"):
        fit_pca(emb, train_limit=0)
    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="at least 2"):
        fit_pca(empty)
    with pytest.raises(ValueError, match="at least 2"):
        fit_pca(empty, exact=True)
    # ragged dims raise in the projection kernel
    m = fit_pca(emb, k=2)
    bad = spark.createDataFrame(
        [(1, [1.0, 2.0])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(Exception, match="dim"):
        pca_project(bad, m).collect()
