from __future__ import annotations

import numpy as np
import pytest

from etl_sentinel_imagery_spark.operators.pca import (
    explained_variance_ratio,
    fit_pca,
    transform_pca,
)
from etl_sentinel_imagery_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def _numpy_pca(x, k):
    mean = x.mean(axis=0)
    cov = np.cov(x.T, bias=True)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T
    for i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return mean, comps, evals[order]


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF_DIR, "embeddings")


def test_fit_matches_numpy_reference(spark, emb):
    x = np.stack(
        [np.asarray(r["embedding"]) for r in emb.collect()]
    ).astype("float64")
    model = fit_pca(emb, k=4)
    mean, comps, evals = _numpy_pca(x, 4)
    np.testing.assert_allclose(model["mean"], mean, atol=1e-10)
    np.testing.assert_allclose(model["explained_var"], evals, atol=1e-8)
    np.testing.assert_allclose(model["components"], comps, atol=1e-8)
    r = explained_variance_ratio(model)
    assert (r > 0).all() and (np.diff(r) <= 1e-12).all()


def test_fit_invariant_to_partitioning(spark, emb):
    a = fit_pca(emb, k=3)
    b = fit_pca(emb.repartition(13), k=3)
    np.testing.assert_allclose(a["components"], b["components"], atol=1e-9)
    np.testing.assert_allclose(a["mean"], b["mean"], atol=1e-12)


def test_transform_projects_and_whitens(spark, emb):
    model = fit_pca(emb, k=3)
    out = transform_pca(emb, model).collect()
    x = {r["vec_id"]: np.asarray(r["pca"]) for r in out}
    raw = {
        r["vec_id"]: np.asarray(r["embedding"], dtype="float64")
        for r in emb.collect()
    }
    vid = next(iter(x))
    want = (raw[vid] - model["mean"]) @ model["components"].T
    np.testing.assert_allclose(x[vid], want, atol=1e-10)
    # other columns survive
    assert {"vec_id", "label", "pca"} <= set(out[0].asDict().keys())

    # whitened: every component has unit variance over the corpus
    w = transform_pca(emb, model, whiten=True).collect()
    mat = np.stack([np.asarray(r["pca"]) for r in w])
    np.testing.assert_allclose(mat.var(axis=0), 1.0, rtol=1e-6)


def test_reconstruction_improves_with_k(spark, emb):
    x = np.stack(
        [np.asarray(r["embedding"]) for r in emb.collect()]
    ).astype("float64")

    def recon_err(k):
        m = fit_pca(emb, k=k)
        y = (x - m["mean"]) @ m["components"].T
        back = y @ m["components"] + m["mean"]
        return float(((x - back) ** 2).mean())

    d = x.shape[1]
    e2, e4, efull = recon_err(2), recon_err(4), recon_err(d)
    assert e2 >= e4 >= efull
    assert efull < 1e-18  # full rank reconstructs exactly
