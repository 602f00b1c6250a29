"""Distributed PCA over embedding columns — decorrelate, reduce, whiten.

The vector family's missing basis transform: quantization
(`operators.similarity`: int8/PQ/OPQ) compresses in the GIVEN basis;
PCA finds the basis — dimensionality reduction before ANN (256→64 dims
is a 4× cut that usually costs <2% recall), whitening before cosine
dedup, and the classic pre-rotation feeding PQ.

Scale shape (the standard tall-skinny factorization): the covariance
of an (n × d) corpus with d ≲ 2048 needs only the d×d Gram matrix and
the d-vector column sum — both MAP-SIDE COMBINABLE: each Arrow batch
contributes one dᵀd GEMM (`X.T @ X`) and one column sum, partials add
associatively through ``treeReduce``-style aggregation (here: one
combinable groupBy on a constant key over per-partition partials), and
eigendecomposition runs on the DRIVER over the d×d result —
control-plane-sized by definition (d=1024 → 8 MB). The corpus is
never shuffled; projection is one broadcast (d × k) GEMM per batch.

Sign convention: each component's largest-|loading| coordinate is made
positive, so results are deterministic across partitionings and match
the numpy reference exactly (eigenvectors are otherwise sign-ambiguous).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _partial_moments(df: DataFrame, vec_col: str) -> DataFrame:
    """Per-partition (n, Σx, XᵀX) partials — one Arrow pass, no shuffle
    beyond the final constant-key combine."""

    def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = 0
        s = None
        g = None
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack(pdf[vec_col].to_numpy()).astype("float64")
            n += x.shape[0]
            s = x.sum(axis=0) if s is None else s + x.sum(axis=0)
            gg = x.T @ x
            g = gg if g is None else g + gg
        if n:
            yield pd.DataFrame(
                {
                    "n": [n],
                    "s": [s.tolist()],
                    "g": [g.reshape(-1).tolist()],
                }
            )

    return df.select(vec_col).mapInPandas(
        part, "n long, s array<double>, g array<double>"
    )


def fit_pca(
    embeddings: DataFrame,
    k: int,
    vec_col: str = "embedding",
) -> dict:
    """Fit PCA → ``{mean (d,), components (k, d), explained_var (k,),
    total_var}`` (numpy arrays). One corpus pass; the driver sees only
    per-partition d×d partials."""
    parts = _partial_moments(embeddings, vec_col).collect()
    if not parts:
        raise ValueError("empty embeddings DataFrame")
    n = sum(r["n"] for r in parts)
    d = len(parts[0]["s"])
    s = np.zeros(d)
    g = np.zeros((d, d))
    for r in parts:
        s += np.asarray(r["s"])
        g += np.asarray(r["g"]).reshape(d, d)
    mean = s / n
    cov = g / n - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T  # (k, d)
    # deterministic sign: largest-|loading| coordinate positive
    for i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return {
        "mean": mean,
        "components": comps,
        "explained_var": np.maximum(evals[order], 0.0),
        "total_var": float(np.maximum(evals, 0.0).sum()),
    }


def transform_pca(
    embeddings: DataFrame,
    model: dict,
    vec_col: str = "embedding",
    out_col: str = "pca",
    whiten: bool = False,
    eps: float = 1e-12,
) -> DataFrame:
    """Project onto the fitted components: one broadcast (d × k) GEMM
    per Arrow batch; ``whiten=True`` scales each component to unit
    variance (the isotropic space cosine dedup and k-means want)."""
    mean = np.asarray(model["mean"], dtype="float64")
    comps = np.asarray(model["components"], dtype="float64")
    scale = (
        1.0 / np.sqrt(np.asarray(model["explained_var"]) + eps)
        if whiten
        else None
    )
    other = [c for c in embeddings.columns if c != vec_col]

    def project(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack(pdf[vec_col].to_numpy()).astype("float64")
            y = (x - mean) @ comps.T
            if scale is not None:
                y = y * scale
            out = pdf[other].copy()
            out[out_col] = list(y)
            yield out

    schema = ", ".join(
        [f"`{c}` {embeddings.schema[c].dataType.simpleString()}" for c in other]
        + [f"{out_col} array<double>"]
    )
    return embeddings.mapInPandas(project, schema)


def explained_variance_ratio(model: dict) -> np.ndarray:
    return np.asarray(model["explained_var"]) / model["total_var"]
