"""Scale-path stress: SemDeDup at 1M embeddings, plus the skewed-
corpus mega-cluster guard boundary (round-4 verdict #6).

Two phases:

1. **Balanced 1M run, exact recovery.** Embeddings generated
   Spark-side (mapInPandas, deterministic per id — no driver
   materialization): each id gets topic ``id % n_topics`` and vector
   ``unit(basis[topic] + 1.5·noise(id))`` — within-topic non-dup
   cosine ≈ 0.3, far below threshold. Every id with ``id % 997 == 0``
   (and > 0) is a PLANTED semantic duplicate: its vector copies
   ``id-1``'s plus 1e-3 noise (cos ≈ 1). The run must drop exactly
   the planted set with ``dup_of == id-1`` and keep everything else.

2. **Skewed guard boundary.** 40% of ids carry the SAME boilerplate
   embedding (the same error page crawled 400k times — ±1e-3 noise),
   which lands on one centroid REGARDLESS of k: a diffuse mega-topic
   would be subdivided by k-means, a tight boilerplate cluster
   cannot be. Its Σ|c|² GEMM would be ~640 GB of float32 scores; the
   mega-cluster guard (``max_cluster_size``) must RAISE before any
   executor attempts that allocation. The documented remedy is the
   EXACT-DEDUP TIER (near-identical content is MinHash/exact dedup's
   job, upstream of SemDeDup) — after removing the boilerplate pile,
   the same corpus completes under the same cap.

Evidence for PERF.md that the per-cluster applyInPandas GEMM and the
IVF assignment hold at corpus scale, and that skew fails loudly, not
with an executor OOM.

Usage: python tools/stress_semdedup.py [n_vecs]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from etl_sentinel_imagery_spark.operators.semdedup import semantic_dedup
from etl_sentinel_imagery_spark.session import get_spark

DIM = 64
N_TOPICS = 256
DUP_EVERY = 997


def _bases(n_topics: int) -> np.ndarray:
    rng = np.random.default_rng(42)
    b = rng.standard_normal((n_topics, DIM))
    return b / np.linalg.norm(b, axis=1, keepdims=True)


def _noise(ids: np.ndarray) -> np.ndarray:
    """Deterministic per-(id, component) pseudo-noise (the fract-sin
    hash), vectorized — executors regenerate identical vectors with no
    broadcast state."""
    j = np.arange(DIM)[None, :]
    x = np.sin(ids[:, None] * 12.9898 + (j + 1) * 78.233) * 43758.5453
    return (x - np.floor(x)) - 0.5


def _vectors(ids: np.ndarray, skewed: bool) -> np.ndarray:
    bases = _bases(N_TOPICS)
    v = bases[ids % N_TOPICS] + 1.5 * _noise(ids)
    # planted duplicates copy id-1's vector (recursion is impossible:
    # id % DUP_EVERY == 0 implies (id-1) % DUP_EVERY != 0)
    dup = (ids % DUP_EVERY == 0) & (ids > 0)
    if dup.any():
        prev = ids[dup] - 1
        v[dup] = (
            bases[prev % N_TOPICS]
            + 1.5 * _noise(prev)
            + 1e-3 * _noise(ids[dup])
        )
    if skewed:
        # a TIGHT boilerplate pile: 40% of the corpus is the same
        # embedding ±1e-3 — one centroid absorbs it for any k
        boiler = ids % 10 < 4
        v[boiler] = bases[0] + 1e-3 * _noise(ids[boiler])
    return (v / np.linalg.norm(v, axis=1, keepdims=True)).astype("float32")


def synth_embeddings(spark, n: int, skewed: bool = False):
    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            vecs = _vectors(ids, skewed)
            yield pd.DataFrame(
                {"vec_id": ids, "embedding": list(vecs)}
            )

    return spark.range(n).repartition(64).mapInPandas(
        gen, schema="vec_id bigint, embedding array<float>"
    )


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g")
    spark = get_spark(
        "stress_semdedup", extra_conf={"spark.driver.memory": mem}
    )
    spark.sparkContext.setLogLevel("ERROR")

    # ---- phase 1: balanced, exact recovery -------------------------
    emb = synth_embeddings(spark, n).localCheckpoint()
    t0 = time.time()
    out = semantic_dedup(
        emb,
        threshold=0.95,
        n_clusters=N_TOPICS,
        kmeans_iters=2,
        max_cluster_size=max(50_000, 4 * n // N_TOPICS),
    ).localCheckpoint()
    wall = time.time() - t0
    planted = {i for i in range(DUP_EVERY, n, DUP_EVERY)}
    dropped = {
        r["id"]: r["dup_of"] for r in out.filter("NOT keep").collect()
    }
    exact_pairs = sum(
        1 for i, d in dropped.items() if i in planted and d == i - 1
    )
    false_drops = len(dropped) - sum(1 for i in dropped if i in planted)
    print(
        f"semdedup n={n}: wall={wall:.1f}s planted={len(planted)} "
        f"dropped={len(dropped)} exact_pairs={exact_pairs} "
        f"false_drops={false_drops}"
    )
    assert set(dropped) == planted, (
        f"drop set mismatch: {len(dropped)} vs {len(planted)} planted"
    )
    assert exact_pairs == len(planted), "dup_of must name id-1"

    # ---- phase 2: skewed corpus — the guard must fire --------------
    emb_skew = synth_embeddings(spark, n, skewed=True).localCheckpoint()
    cap = n // 10  # well below the ~40% mega-cluster
    t0 = time.time()
    try:
        semantic_dedup(
            emb_skew,
            threshold=0.95,
            n_clusters=N_TOPICS,
            kmeans_iters=2,
            max_cluster_size=cap,
        ).count()
        raise SystemExit("guard did NOT fire on the skewed corpus")
    except Exception as e:  # surfaces through the Py4J job failure
        if "max_cluster_size" not in str(e):
            raise
        print(
            f"skew guard fired at cap={cap} after "
            f"{time.time() - t0:.1f}s (no executor OOM)"
        )
    # the documented remedy: the exact-dedup tier removes the
    # boilerplate pile UPSTREAM (keep one representative); the cleaned
    # corpus then completes under the very same cap
    cleaned = emb_skew.filter(
        (F.col("vec_id") % 10 >= 4) | (F.col("vec_id") == 0)
    )
    t0 = time.time()
    n_drop = (
        semantic_dedup(
            cleaned,
            threshold=0.95,
            n_clusters=N_TOPICS,
            kmeans_iters=2,
            max_cluster_size=cap,
        )
        .filter("NOT keep")
        .count()
    )
    print(
        f"cleaned skew corpus under same cap: "
        f"wall={time.time() - t0:.1f}s dropped={n_drop}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
