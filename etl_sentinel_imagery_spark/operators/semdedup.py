"""Semantic deduplication — SemDeDup (Abbas et al. 2023,
arXiv:2303.09540) mapped onto Spark.

Web-scale corpora carry *semantic* duplicates exact/MinHash dedup
can't see (same content re-rendered, templated rewrites, near-identical
images by embedding). SemDeDup's observation: k-means cluster the
embedding space, then compare pairs ONLY within a cluster — semantic
duplicates land in the same cluster by construction (identical vectors
assign identically; near-identical ones share the nearest centroid for
any threshold tight enough to matter), so the O(n²) pair space shrinks
to Σ|cluster|².

Spark shape: the cluster assignment is the engine's IVF assignment
(one narrow Arrow-batched pass, operators.similarity.ivf_assign); the
within-cluster comparison is one applyInPandas group per cluster — a
normalized GEMM (V·Vᵀ) per group, never a corpus-wide shuffle of
pairs. The keep rule is the paper's greedy-by-order rule made
deterministic: a vector is DROPPED iff some LOWER-ID vector in its
cluster has cosine ≥ threshold (ties can't flap — ids are total).
``dup_of`` records the smallest such id, so the output doubles as the
edge list from each dropped item to its kept representative (the
representative itself has a lower id than everything it absorbs, and
is never dropped by a member of its own group — it might be dropped by
a still-lower id, in which case `dup_of` chains resolve like
union-find parents).

A cluster larger than ``max_cluster_size`` raises (non-silent): its
GEMM is quadratic in the cluster, and an over-coarse k is a plan bug —
raise k or pre-split, same policy as the LSH mega-bucket cap.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from etl_sentinel_imagery_spark.operators.kmeans import fit as kmeans_fit
from etl_sentinel_imagery_spark.operators.similarity import ivf_assign

_OUT_SCHEMA = "id bigint, cluster int, keep boolean, dup_of bigint"


def semantic_dedup(
    embeddings: DataFrame,
    threshold: float = 0.95,
    centroids: np.ndarray | None = None,
    n_clusters: int = 16,
    kmeans_iters: int = 4,
    max_cluster_size: int = 200_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, cluster, keep, dup_of) for every input vector. ``centroids``
    reuses a trained matrix (e.g. the serving index's); otherwise
    spherical k-means|| trains one here."""
    if centroids is None:
        centroids, _ = kmeans_fit(
            embeddings,
            k=n_clusters,
            n_iter=kmeans_iters,
            id_col=id_col,
            vec_col=vec_col,
            init="scalable",
        )
    assigned = ivf_assign(embeddings, centroids, id_col, vec_col)

    def dedup_cluster(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) > max_cluster_size:
            raise ValueError(
                f"cluster of {len(pdf)} exceeds max_cluster_size="
                f"{max_cluster_size}; raise n_clusters (the GEMM is "
                "quadratic per cluster)"
            )
        pdf = pdf.sort_values(id_col, ignore_index=True)
        ids = pdf[id_col].to_numpy()
        mat = np.stack(pdf[vec_col].map(np.asarray)).astype("float64")
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        norms[norms == 0] = 1.0  # zero vectors: cosine 0 to everything
        v = mat / norms
        sims = v @ v.T
        n = len(ids)
        keep = np.ones(n, dtype=bool)
        dup_of = np.full(n, -1, dtype="int64")
        for i in range(1, n):
            # smallest lower-ID match; ids are sorted so index order = id order
            hits = np.nonzero(sims[i, :i] >= threshold)[0]
            if hits.size:
                keep[i] = False
                dup_of[i] = ids[hits[0]]
        return pd.DataFrame(
            {
                "id": ids,
                "cluster": int(pdf["bucket"].iloc[0]),
                "keep": keep,
                "dup_of": [None if d < 0 else int(d) for d in dup_of],
            }
        )

    return assigned.groupBy("bucket").applyInPandas(
        dedup_cluster, _OUT_SCHEMA
    )
