"""Trainable quality classifier — hashed bag-of-n-grams logistic
regression with distributed gradients.

The curation stack's heuristic gates (Gopher stats, LM perplexity)
cover generic junk; production pipelines also train a SUPERVISED
quality model on labeled examples (the GPT-3/CCNet "quality filter":
positives = curated reference text, negatives = raw crawl) and gate on
its score. The standard shape is linear over hashed n-gram features —
fastText-without-embeddings — because at corpus scale the model must
be cheap enough to score every document.

Spark mapping (the same partial-aggregation contract as k-means):

- **Features** (:func:`hash_features`): token uni+bigrams hash (the
  engine-portable polyhash) into ``dim`` buckets; a document is the
  SPARSE (index, count) list — built with pure JVM expressions
  (explode → groupBy(doc, idx)), L2-normalized at use time so scores
  are length-invariant.
- **Training** (:func:`train_logreg`): full-batch gradient descent;
  each Arrow batch accumulates one dense dim-sized gradient partial in
  numpy, partials sum driver-side (dim doubles — control-plane-sized
  by construction; dim is a model choice, never corpus-dependent), the
  driver takes the step. No RNG anywhere; the only nondeterminism
  is float summation order of the per-partition partials (~1e-16 —
  the same caveat every distributed GD has).
- **Scoring** (:func:`score_logreg`): broadcast weights, one narrow
  Arrow pass → sigmoid score per document.

AUC evaluation (:func:`auc`) is the exact tie-corrected Mann-Whitney
statistic over per-distinct-score aggregates with the engine's
two-phase distributed prefix sum — no pair explosion, no single-task
rank window.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_sentinel_imagery_spark.functions.text import polyhash, tokens


def hash_features(
    docs: DataFrame,
    dim: int = 1 << 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, idx array<int>, cnt array<double>) sparse hashed features:
    lowercased token unigrams + bigrams → polyhash mod dim. JVM-side
    end to end; arrays are index-sorted so downstream kernels can rely
    on a canonical order."""
    toks = tokens(F.lower(F.col(text_col)))
    grams = F.concat(
        toks,
        F.when(
            F.size(toks) >= 2,
            F.zip_with(
                F.slice(toks, 1, F.size(toks) - 1),
                F.slice(toks, 2, F.size(toks) - 1),
                lambda a, b: F.concat_ws(" ", a, b),
            ),
        ).otherwise(F.array().cast("array<string>")),
    )
    exploded = docs.select(
        F.col(id_col), F.explode(grams).alias("_g")
    ).select(
        id_col, F.pmod(polyhash(F.col("_g")), F.lit(dim)).cast("int").alias("_i")
    )
    per_idx = exploded.groupBy(id_col, "_i").agg(
        F.count(F.lit(1)).cast("double").alias("_c")
    )
    return (
        per_idx.groupBy(id_col)
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("_i"), F.col("_c")))
            ).alias("_s")
        )
        .select(
            id_col,
            F.transform(F.col("_s"), lambda s: s["_i"]).alias("idx"),
            F.transform(F.col("_s"), lambda s: s["_c"]).alias("cnt"),
        )
    )


def _l2_rows(idx_s: pd.Series, cnt_s: pd.Series):
    for idx, cnt in zip(idx_s, cnt_s):
        i = np.asarray(idx, dtype="int64")
        c = np.asarray(cnt, dtype="float64")
        n = np.linalg.norm(c)
        yield i, (c / n if n > 0 else c)


def train_logreg(
    features: DataFrame,
    labels: DataFrame,
    dim: int = 1 << 16,
    n_iter: int = 30,
    lr: float = 1.0,
    l2: float = 1e-4,
    id_col: str = "doc_id",
    label_col: str = "label",
) -> np.ndarray:
    """Full-batch GD on log loss; returns the (dim+1,) weight vector
    (last entry = bias). ``labels``: (id, label∈{0,1}). Each iteration
    is one Spark job: per-batch dense gradient partials → driver sum →
    step. The broadcast weight rides in the closure (dim doubles)."""
    joined = features.join(labels, id_col).select(
        "idx", "cnt", F.col(label_col).cast("double").alias("_y")
    )
    joined = joined.localCheckpoint(eager=True)  # train loop re-reads
    n_total = joined.count()
    w = np.zeros(dim + 1)

    for _ in range(n_iter):
        w_b = w  # closure capture of this iteration's weights

        def _grad(batches):
            for pdf in batches:
                g = np.zeros(dim + 1)
                loss = 0.0
                for (i, c), y in zip(
                    _l2_rows(pdf["idx"], pdf["cnt"]), pdf["_y"]
                ):
                    z = float(c @ w_b[i]) + w_b[-1]
                    p = 1.0 / (1.0 + np.exp(-z))
                    err = p - float(y)
                    g[i] += err * c
                    g[-1] += err
                    loss += -(
                        float(y) * np.log(max(p, 1e-12))
                        + (1 - float(y)) * np.log(max(1 - p, 1e-12))
                    )
                yield pd.DataFrame({"g": [g.tolist()], "loss": [loss]})

        parts = joined.mapInPandas(
            _grad, schema="g array<double>, loss double"
        ).collect()
        g = np.zeros(dim + 1)
        for r in parts:
            g += np.asarray(r["g"])
        g /= n_total
        g[:-1] += l2 * w[:-1]  # no penalty on the bias
        w = w - lr * g
    return w


def score_logreg(
    features: DataFrame,
    w: np.ndarray,
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, quality_score) — sigmoid of the linear score, one narrow
    Arrow pass with the weights in the closure."""
    w_b = np.asarray(w, dtype="float64")

    def _score(batches):
        for pdf in batches:
            out = []
            for i, c in _l2_rows(pdf["idx"], pdf["cnt"]):
                z = float(c @ w_b[i]) + w_b[-1]
                out.append(1.0 / (1.0 + np.exp(-z)))
            yield pd.DataFrame(
                {id_col: pdf[id_col], "quality_score": out}
            )

    return features.select(id_col, "idx", "cnt").mapInPandas(
        _score, schema=f"{id_col} bigint, quality_score double"
    )


def auc(
    scored: DataFrame,
    label_col: str = "label",
    score_col: str = "quality_score",
) -> float:
    """Exact ROC-AUC via Mann-Whitney with the tie correction:
    AUC = Σ_s n_pos(s)·(cum_neg(<s) + n_neg(s)/2) / (n₁·n₀), computed
    over per-DISTINCT-SCORE aggregates with the engine's two-phase
    distributed prefix sum (operators.packing.with_global_offset) — no
    pair explosion and no single-task no-partition rank window (the
    antipattern the packing module exists to avoid)."""
    from etl_sentinel_imagery_spark.operators.packing import (
        with_global_offset,
    )

    y = F.col(label_col).cast("int")
    per_score = scored.groupBy(F.col(score_col).alias("_s")).agg(
        F.sum(y).alias("_np"), F.sum(1 - y).alias("_nn")
    )
    with_off = with_global_offset(per_score, "_s", "_nn", out_col="_cumneg")
    row = with_off.agg(
        F.sum(
            F.col("_np")
            * (F.col("_cumneg") + F.col("_nn").cast("double") * 0.5)
        ).alias("num"),
        F.sum("_np").alias("n1"),
        F.sum("_nn").alias("n0"),
    ).collect()[0]
    return float(row["num"] / (row["n1"] * row["n0"]))
