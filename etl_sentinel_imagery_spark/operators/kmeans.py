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
    init: str = "first_k",
) -> tuple[np.ndarray, list[float]]:
    """Run n_iter Lloyd's passes; returns (centroids, per-iter inertia).

    Inertia here = mean(1 − cos(x, centroid(x))) — monotone non-increasing
    for spherical k-means up to empty-cluster resets. ``init``:
    'first_k' (deterministic test seed) or 'scalable' (k-means||, the
    corpus-scale initialization)."""
    if init == "scalable":
        centroids = init_centroids_scalable(embeddings, k, id_col=id_col, vec_col=vec_col)
    else:
        centroids = init_centroids(embeddings, k, id_col, vec_col)
    inertias: list[float] = []

    narrow = embeddings.select(vec_col)
    for _ in range(n_iter):
        # one fused corpus pass per Lloyd iteration (round 13, guide
        # §2.4/§4): assignment and the per-cluster partial sums happen
        # in a SINGLE mapInPandas — the old shape crossed the Python
        # boundary twice per pass (ivf_assign's pandas UDF, then a
        # second mapInPandas over (embedding, bucket)) and shuffled the
        # partials into a JVM collect_list fold. Each task now yields
        # at most k rows, so the ≤ tasks×k partials skip the exchange
        # entirely and reduce driver-side (control-plane sized, like
        # the packing/stats collects). Assignment math is byte-for-byte
        # ivf_assign's: row-normalize, argmax(mat @ unit-centroids.T).
        cent = centroids / np.linalg.norm(centroids, axis=1, keepdims=True)
        cent_raw = centroids

        def _assign_partial(
            batches: Iterator[pd.DataFrame],
        ) -> Iterator[pd.DataFrame]:
            kk, dim = cent.shape
            vec_sum = np.zeros((kk, dim))
            n = np.zeros(kk, dtype="int64")
            cos_sum = np.zeros(kk)
            for pdf in batches:
                if not len(pdf):
                    continue
                mat = _normalize_rows(np.stack(pdf[vec_col].map(np.asarray)))
                buckets = np.argmax(mat @ cent.T, axis=1)
                for b in np.unique(buckets):
                    sel = mat[buckets == b]
                    vec_sum[b] += sel.sum(axis=0)
                    n[b] += sel.shape[0]
                    cos_sum[b] += float((sel @ cent_raw[int(b)]).sum())
            hit = np.nonzero(n)[0]
            yield pd.DataFrame(
                {
                    "bucket": hit.astype("int32"),
                    "vec_sum": [vec_sum[b].tolist() for b in hit],
                    "n": n[hit],
                    "cos_sum": cos_sum[hit],
                }
            )

        agg = narrow.mapInPandas(
            _assign_partial,
            schema="bucket int, vec_sum array<double>, n bigint, cos_sum double",
        ).collect()
        total_n = sum(r["n"] for r in agg)
        total_cos = sum(r["cos_sum"] for r in agg)
        inertias.append(1.0 - total_cos / total_n)
        new_centroids = centroids.copy()
        by_bucket: dict[int, tuple[np.ndarray, int]] = {}
        for r in agg:
            v, cnt = by_bucket.get(r["bucket"], (np.zeros(centroids.shape[1]), 0))
            by_bucket[r["bucket"]] = (v + np.array(r["vec_sum"]), cnt + r["n"])
        for b, (v, cnt) in by_bucket.items():
            if cnt > 0:
                norm = np.linalg.norm(v)
                if norm > 0:
                    new_centroids[b] = v / norm
        centroids = new_centroids
    return centroids, inertias


def init_centroids_scalable(
    embeddings: DataFrame,
    k: int,
    l: int | None = None,
    rounds: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """k-means|| initialization (Bahmani et al. 2012, public algorithm),
    deterministic: the per-point Bernoulli draws use an id-keyed integer
    hash instead of an RNG, so the same corpus always seeds the same
    centroids (reproducible pipelines, retry-safe).

    Each round scores the corpus once — the scored frame is persisted so
    the ψ aggregate and the oversampled draw share one UDF pass — then
    the ≤ l·rounds+1 candidates are reduced driver-side by weighted
    farthest-first + weighted Lloyd — k-means++'s reclustering step with
    the randomness replaced by maximin, which is deterministic."""
    l = l or 2 * k
    first = (
        embeddings.orderBy(id_col).limit(1).select(vec_col).collect()[0][vec_col]
    )
    centers = [np.asarray(first, dtype="float64")]
    centers[0] = centers[0] / np.linalg.norm(centers[0])

    for rnd in range(rounds):
        cent = np.stack(centers)

        @F.pandas_udf("double")
        def best_d2(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
            for vecs in batches:
                mat = _normalize_rows(np.stack(vecs.map(np.asarray)))
                yield pd.Series(1.0 - (mat @ cent.T).max(axis=1))

        # persisted: the ψ aggregate and the draw below both consume this
        # frame — without the barrier the full-corpus scoring UDF would
        # run twice per round
        scored = embeddings.select(
            F.col(id_col), F.col(vec_col), best_d2(F.col(vec_col)).alias("d2")
        ).persist()
        try:
            psi = scored.agg(F.sum("d2")).collect()[0][0]
            if not psi or psi <= 0:
                break  # every point coincides with a center already
            u = (
                F.pmod(F.xxhash64(F.col(id_col), F.lit(rnd)), F.lit(1_000_000))
                + F.lit(0.5)
            ) / F.lit(1_000_000.0)
            drawn = scored.filter(
                u < F.lit(float(l)) * F.col("d2") / F.lit(float(psi))
            ).collect()
        finally:
            scored.unpersist()
        for r in drawn:
            v = np.asarray(r[vec_col], dtype="float64")
            centers.append(v / np.linalg.norm(v))

    cand = np.stack(centers)
    if len(centers) <= k:
        # tiny corpus: pad with repeats of the first center
        pad = np.repeat(cand[:1], k - len(centers) + 1, axis=0)
        return np.vstack([cand, pad])[:k]

    # weight candidates by how much corpus they attract (one pass)
    counts = {
        r["bucket"]: r["n"]
        for r in ivf_assign(embeddings, cand, id_col, vec_col)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    w = np.array([counts.get(i, 0) for i in range(len(cand))], dtype="float64")

    # deterministic weighted farthest-first seeding over the candidates
    chosen = [int(np.argmax(w))]
    for _ in range(k - 1):
        d2 = 1.0 - (cand @ cand[chosen].T).max(axis=1)
        d2[chosen] = -1.0
        chosen.append(int(np.argmax(w * d2)))
    centroids = cand[chosen]

    # a few weighted Lloyd passes on the candidate set (driver-side numpy)
    for _ in range(5):
        assign = np.argmax(cand @ centroids.T, axis=1)
        for j in range(k):
            sel = assign == j
            if w[sel].sum() > 0:
                v = (cand[sel] * w[sel, None]).sum(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    centroids[j] = v / n
    return centroids
