"""Grouped-map UDAF test: per-label centroids vs a numpy reference."""

from __future__ import annotations

import numpy as np

from etl_sentinel_imagery_spark.operators.udaf import label_centroids
from etl_sentinel_imagery_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_label_centroids_match_numpy(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    got = {r["label"]: r for r in label_centroids(emb).collect()}
    rows = emb.collect()
    by_label: dict[int, list] = {}
    for r in rows:
        by_label.setdefault(r["label"], []).append(np.array(r["embedding"], dtype="float64"))
    assert set(got) == set(by_label)
    for label, vecs in by_label.items():
        mat = np.stack(vecs)
        center = mat.mean(axis=0)
        assert got[label]["n_vectors"] == len(vecs)
        assert np.allclose(got[label]["centroid"], center, atol=1e-9)
        dists = np.linalg.norm(mat - center, axis=1)
        assert abs(got[label]["mean_dist"] - dists.mean()) < 1e-9
        assert abs(got[label]["max_dist"] - dists.max()) < 1e-9
