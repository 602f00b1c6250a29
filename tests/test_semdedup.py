"""SemDeDup semantic dedup: single-cluster output equals the naive
greedy reference, planted duplicates collapse across the clustered
path, zero vectors and the mega-cluster guard behave."""

from __future__ import annotations

import numpy as np
import pytest

from etl_sentinel_imagery_spark.operators.semdedup import semantic_dedup

DIM = 16


def _naive(ids, vecs, threshold):
    norms = np.linalg.norm(vecs, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    v = vecs / norms
    keep, dup_of = {}, {}
    order = np.argsort(ids)
    for pos_i, i in enumerate(order):
        hit = None
        for j in order[:pos_i]:
            if float(v[i] @ v[j]) >= threshold:
                hit = ids[j]
                break
        keep[ids[i]] = hit is None
        dup_of[ids[i]] = hit
    return keep, dup_of


def test_single_cluster_equals_naive_greedy(spark):
    rng = np.random.default_rng(31)
    vecs = rng.normal(size=(40, DIM))
    # plant near-dups: 5 pairs at cosine ~0.99, one exact triple
    for a, b in ((0, 7), (3, 11), (5, 20), (8, 30), (13, 33)):
        vecs[b] = vecs[a] + 0.02 * rng.normal(size=DIM)
    vecs[25] = vecs[2]
    vecs[35] = vecs[2]
    ids = list(range(40))
    emb = spark.createDataFrame(
        [(i, vecs[i].tolist()) for i in ids],
        "vec_id bigint, embedding array<double>",
    )
    cents = np.mean(vecs, axis=0, keepdims=True)  # one cluster
    out = {
        r["id"]: r
        for r in semantic_dedup(
            emb, threshold=0.95, centroids=cents
        ).collect()
    }
    keep, dup_of = _naive(np.array(ids), vecs, 0.95)
    assert len(out) == 40
    for i in ids:
        assert out[i]["keep"] == keep[i], i
        assert out[i]["dup_of"] == dup_of[i], i
    # the exact triple: 2 kept, 25 and 35 both point at 2
    assert out[2]["keep"] and out[25]["dup_of"] == 2 and out[35]["dup_of"] == 2


def test_clustered_path_catches_planted_duplicates(spark):
    """Clustered corpus: every planted exact duplicate is dropped with
    dup_of = its source (identical vectors always share a cluster),
    and cluster-mates below threshold survive."""
    rng = np.random.default_rng(53)
    # unit-scale centers + wide noise: cluster-mates sit near cosine
    # ~0.9, far below the 0.999 exact-copy threshold — no accidental
    # drops, while exact copies still share a cluster deterministically
    centers = rng.normal(size=(4, DIM))
    vecs = np.stack(
        [centers[i % 4] + 0.5 * rng.normal(size=DIM) for i in range(80)]
    )
    dup_pairs = [(1, 61), (6, 70), (11, 79)]
    for a, b in dup_pairs:
        vecs[b] = vecs[a]
    emb = spark.createDataFrame(
        [(i, vecs[i].tolist()) for i in range(80)],
        "vec_id bigint, embedding array<double>",
    )
    out = {
        r["id"]: r
        for r in semantic_dedup(
            emb, threshold=0.999, n_clusters=4, kmeans_iters=4
        ).collect()
    }
    assert len(out) == 80
    for a, b in dup_pairs:
        assert out[b]["keep"] is False and out[b]["dup_of"] == a
        assert out[a]["cluster"] == out[b]["cluster"]
    n_dropped = sum(1 for r in out.values() if not r["keep"])
    assert n_dropped == len(dup_pairs)  # 0.999 drops only exact copies


def test_zero_vectors_and_mega_cluster_guard(spark):
    vecs = [[0.0] * DIM, [0.0] * DIM, [1.0] + [0.0] * (DIM - 1)]
    emb = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)],
        "vec_id bigint, embedding array<double>",
    )
    cents = np.ones((1, DIM))
    out = {
        r["id"]: r
        for r in semantic_dedup(emb, threshold=0.9, centroids=cents).collect()
    }
    # zero vectors have cosine 0 to everything (incl. each other): all kept
    assert all(out[i]["keep"] for i in range(3))
    with pytest.raises(Exception, match="max_cluster_size"):
        semantic_dedup(
            emb, threshold=0.9, centroids=cents, max_cluster_size=2
        ).collect()
