"""Spherical k-means — the iterative centroid trainer for the IVF index.

Lloyd's iterations, Spark-shaped: each pass is one distributed job —
assignment (Arrow-batched numpy matmul per partition, reusing
similarity.ivf_assign) and a grouped per-cluster mean. Only the k×dim
centroid matrix crosses the driver boundary per iteration; the corpus
never does. At 100 TB the exact same loop runs with a sampled
initialization (k-means||) and a broadcast centroid matrix — both are
what this module does already, at test scale.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_sentinel_imagery_spark.operators.similarity import ivf_assign


def _normalize_rows(mat: np.ndarray) -> np.ndarray:
    return mat / np.linalg.norm(mat, axis=1, keepdims=True)


def init_centroids(
    embeddings: DataFrame, k: int, id_col: str = "vec_id", vec_col: str = "embedding"
) -> np.ndarray:
    """Deterministic seed: the k lowest-id vectors (swap for k-means||
    sampling at scale)."""
    rows = (
        embeddings.orderBy(id_col).limit(k).select(vec_col).collect()
    )
    return _normalize_rows(np.array([r[vec_col] for r in rows], dtype="float64"))


def fit(
    embeddings: DataFrame,
    k: int = 8,
    n_iter: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[np.ndarray, list[float]]:
    """Run n_iter Lloyd's passes; returns (centroids, per-iter inertia).

    Inertia here = mean(1 − cos(x, centroid(x))) — monotone non-increasing
    for spherical k-means up to empty-cluster resets."""
    centroids = init_centroids(embeddings, k, id_col, vec_col)
    inertias: list[float] = []

    for _ in range(n_iter):
        assigned = ivf_assign(embeddings, centroids, id_col, vec_col)

        def _partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                mat = _normalize_rows(np.stack(pdf[vec_col].map(np.asarray)))
                buckets = pdf["bucket"].to_numpy()
                rows = []
                for b in np.unique(buckets):
                    sel = mat[buckets == b]
                    rows.append(
                        {
                            "bucket": int(b),
                            "vec_sum": sel.sum(axis=0).tolist(),
                            "n": int(sel.shape[0]),
                            "cos_sum": float((sel @ centroids[int(b)]).sum()),
                        }
                    )
                yield pd.DataFrame(rows)

        partials = assigned.mapInPandas(
            _partial, schema="bucket int, vec_sum array<double>, n bigint, cos_sum double"
        )
        agg = (
            partials.groupBy("bucket")
            .agg(
                F.aggregate(
                    F.collect_list("vec_sum"),
                    F.array_repeat(F.lit(0.0), int(centroids.shape[1])),
                    lambda acc, v: F.zip_with(acc, v, lambda a, b: a + b),
                ).alias("vec_sum"),
                F.sum("n").alias("n"),
                F.sum("cos_sum").alias("cos_sum"),
            )
            .collect()
        )
        total_n = sum(r["n"] for r in agg)
        total_cos = sum(r["cos_sum"] for r in agg)
        inertias.append(1.0 - total_cos / total_n)
        new_centroids = centroids.copy()
        for r in agg:
            if r["n"] > 0:
                v = np.array(r["vec_sum"])
                norm = np.linalg.norm(v)
                if norm > 0:
                    new_centroids[r["bucket"]] = v / norm
        centroids = new_centroids
    return centroids, inertias
