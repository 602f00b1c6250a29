"""Custom aggregation surface: pandas-grouped UDAFs (SURVEY.md §2.10).

The engine's template for aggregates Spark lacks natively, shown on a
real one: per-group vector centroid over an embedding column (the bulk
step of k-means, and the class-prototype computation for
nearest-centroid classification). applyInPandas with one-row-per-group
output = a UDAF with arbitrary state, Arrow-batched.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


def label_centroids(
    embeddings: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-label mean vector + dispersion (mean distance to centroid)."""

    def _centroid(pdf: pd.DataFrame) -> pd.DataFrame:
        mat = np.stack(pdf[vec_col].map(np.asarray)).astype("float64")
        center = mat.mean(axis=0)
        dists = np.linalg.norm(mat - center, axis=1)
        return pd.DataFrame(
            {
                label_col: [pdf[label_col].iloc[0]],
                "centroid": [center.tolist()],
                "n_vectors": [len(pdf)],
                "mean_dist": [float(dists.mean())],
                "max_dist": [float(dists.max())],
            }
        )

    return embeddings.groupBy(label_col).applyInPandas(
        _centroid,
        schema=f"{label_col} int, centroid array<double>, n_vectors bigint, "
        "mean_dist double, max_dist double",
    )
