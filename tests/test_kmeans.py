"""Spherical k-means trainer tests: inertia decreases, IVF recall improves."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from etl_sentinel_imagery_spark.operators.kmeans import fit
from etl_sentinel_imagery_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_inertia_monotone_decreasing(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    centroids, inertias = fit(emb, k=8, n_iter=4)
    assert centroids.shape == (8, 64)
    assert np.allclose(np.linalg.norm(centroids, axis=1), 1.0)
    assert len(inertias) == 4
    for a, b in zip(inertias, inertias[1:]):
        assert b <= a + 1e-9, f"inertia increased: {inertias}"
    assert inertias[-1] < inertias[0]


def test_trained_centroids_beat_naive_for_recall(spark):
    """IVF with trained centroids should match or beat the naive
    first-k-vectors seed on exact-top-5 recall."""
    from etl_sentinel_imagery_spark.operators.similarity import ivf_topk
    from etl_sentinel_imagery_spark.queries.vectors_q import (
        _centroids,
        _cosine_topk,
    )

    emb = load_table(spark, SF_DIR, "embeddings")
    exact = {
        (r["query_id"], r["cand_id"]) for r in _cosine_topk(spark, SF_DIR).collect()
    }
    naive = _centroids(spark, SF_DIR)
    trained, _ = fit(emb, k=8, n_iter=4)

    def recall(cents: np.ndarray) -> float:
        approx = {
            (r["query_id"], r["cand_id"])
            for r in ivf_topk(emb, F.col("vec_id") < 20, cents, k=5).collect()
        }
        return len(exact & approx) / len(exact)

    r_naive, r_trained = recall(naive), recall(trained)
    assert r_trained >= r_naive - 0.05, (r_naive, r_trained)
