"""IVF-PQ combined index: probed-bucket ADC + rerank vs brute force,
partition pruning of the codes scan, model sidecar round-trip, OPQ."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from etl_sentinel_imagery_spark.operators.ivfpq import (
    ivfpq_topk,
    load_model,
    write_ivfpq_index,
)
from etl_sentinel_imagery_spark.operators.kmeans import fit as kmeans_fit
from etl_sentinel_imagery_spark.operators.similarity import (
    train_opq,
    train_pq_codebooks,
)

DIM = 32
N = 400


@pytest.fixture(scope="module")
def corpus(spark):
    rng = np.random.default_rng(61)
    centers = rng.normal(size=(4, DIM))
    vecs = np.stack(
        [centers[i % 4] + 0.25 * rng.normal(size=DIM) for i in range(N)]
    )
    emb = spark.createDataFrame(
        [(i, vecs[i].tolist()) for i in range(N)],
        "vec_id bigint, embedding array<double>",
    )
    return emb, vecs


def _brute(vecs, qid, k):
    normed = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sims = normed @ normed[qid]
    order = sorted(range(len(vecs)), key=lambda i: (-sims[i], i))
    return [i for i in order if i != qid][:k]


def test_ivfpq_end_to_end(spark, corpus, tmp_path):
    emb, vecs = corpus
    cents, _ = kmeans_fit(emb, k=4, n_iter=4, init="first_k")
    books = train_pq_codebooks(emb, m=8, k=16)
    path = str(tmp_path / "ivfpq")
    write_ivfpq_index(emb, cents, books, path)
    # model sidecar round-trips
    c2, b2, r2, res2 = load_model(path)
    assert np.allclose(c2, cents) and np.allclose(b2, books) and r2 is None
    assert res2 is False

    queries = emb.filter(F.col("vec_id") < 6)
    # full probing + rerank: recall vs brute force is high on clustered data
    out = ivfpq_topk(
        spark, path, queries, k=5, n_probe=4, shortlist=40, embeddings=emb
    ).collect()
    by_q: dict = {}
    for r in out:
        by_q.setdefault(r["query_id"], set()).add(r["cand_id"])
    hits = total = 0
    for qid in range(6):
        want = set(_brute(vecs, qid, 5))
        hits += len(by_q[qid] & want)
        total += 5
    assert hits / total >= 0.9, f"ivfpq rerank recall {hits}/{total}"

    # raw ADC mode returns distances ascending
    raw = ivfpq_topk(spark, path, queries, k=5, n_probe=4).collect()
    per_q: dict = {}
    for r in raw:
        per_q.setdefault(r["query_id"], []).append(r)
    for qid, rows in per_q.items():
        rows = sorted(rows, key=lambda r: r["rnk"])
        dists = [r["adc_dist"] for r in rows]
        assert dists == sorted(dists)


def test_ivfpq_scan_is_partition_pruned(spark, corpus, tmp_path):
    import io
    from contextlib import redirect_stdout

    emb, _ = corpus
    cents, _ = kmeans_fit(emb, k=4, n_iter=4, init="first_k")
    books = train_pq_codebooks(emb, m=8, k=16)
    path = str(tmp_path / "pruned")
    write_ivfpq_index(emb, cents, books, path)
    probe_set = [0, 2]
    scan = spark.read.parquet(path).filter(F.col("bucket").isin(probe_set))
    buf = io.StringIO()
    with redirect_stdout(buf):
        scan.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan and "bucket" in plan


def test_ivfpq_with_opq_rotation(spark, corpus, tmp_path):
    emb, vecs = corpus
    cents, _ = kmeans_fit(emb, k=4, n_iter=4, init="first_k")
    rot, books = train_opq(emb, m=8, k=16, n_outer=3)
    path = str(tmp_path / "opq")
    write_ivfpq_index(emb, cents, books, path, rotation=rot)
    c2, b2, r2, _res = load_model(path)
    assert r2 is not None and np.allclose(r2, rot)
    queries = emb.filter(F.col("vec_id") < 4)
    out = ivfpq_topk(
        spark, path, queries, k=5, n_probe=4, shortlist=40, embeddings=emb
    ).collect()
    by_q: dict = {}
    for r in out:
        by_q.setdefault(r["query_id"], set()).add(r["cand_id"])
    hits = sum(
        len(by_q[q] & set(_brute(vecs, q, 5))) for q in range(4)
    )
    assert hits / 20 >= 0.9


def test_residual_ivfpq_beats_or_matches_plain_on_raw_adc(spark, corpus, tmp_path):
    """Residual encoding (the full FAISS IVFPQ construction): raw-ADC
    recall at equal code budget is >= plain encoding's on clustered
    data (residuals concentrate once the coarse quantizer explains the
    clusters), and the end-to-end reranked path stays >= 0.9."""
    from etl_sentinel_imagery_spark.operators.ivfpq import (
        train_residual_codebooks,
    )

    emb, vecs = corpus
    cents, _ = kmeans_fit(emb, k=4, n_iter=4, init="first_k")
    queries = emb.filter(F.col("vec_id") < 6)

    def raw_recall(path):
        out = ivfpq_topk(spark, path, queries, k=5, n_probe=4).collect()
        by_q: dict = {}
        for r in out:
            by_q.setdefault(r["query_id"], set()).add(r["cand_id"])
        return sum(
            len(by_q[q] & set(_brute(vecs, q, 5))) for q in range(6)
        )

    plain_path = str(tmp_path / "plain")
    books = train_pq_codebooks(emb, m=8, k=16)
    write_ivfpq_index(emb, cents, books, plain_path)

    res_path = str(tmp_path / "res")
    rbooks = train_residual_codebooks(emb, cents, m=8, k=16)
    write_ivfpq_index(emb, cents, rbooks, res_path, residual=True)
    _c, _b, _r, res_flag = load_model(res_path)
    assert res_flag is True

    assert raw_recall(res_path) >= raw_recall(plain_path)

    out = ivfpq_topk(
        spark, res_path, queries, k=5, n_probe=4, shortlist=40, embeddings=emb
    ).collect()
    by_q: dict = {}
    for r in out:
        by_q.setdefault(r["query_id"], set()).add(r["cand_id"])
    hits = sum(len(by_q[q] & set(_brute(vecs, q, 5))) for q in range(6))
    assert hits / 30 >= 0.9




def test_opq_residual_reduces_reconstruction_error(spark, corpus, tmp_path):
    """OPQ-on-residuals: the learned rotation is orthogonal, its
    reconstruction error on the training residuals is strictly below
    the unrotated codebooks', and the end-to-end reranked path holds."""
    from etl_sentinel_imagery_spark.operators.ivfpq import (
        train_residual_codebooks,
    )
    from etl_sentinel_imagery_spark.operators.similarity import (
        _pq_reconstruct,
    )

    emb, vecs = corpus
    cents, _ = kmeans_fit(emb, k=4, n_iter=4, init="first_k")
    plain_books = train_residual_codebooks(emb, cents, m=8, k=16)
    rot, opq_books = train_residual_codebooks(
        emb, cents, m=8, k=16, opq=True
    )
    assert np.allclose(rot @ rot.T, np.eye(DIM), atol=1e-9)

    cn = cents / np.linalg.norm(cents, axis=1, keepdims=True)
    mat = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    res = mat - cn[np.argmax(mat @ cn.T, axis=1)]
    err_plain = ((res - _pq_reconstruct(res, plain_books)) ** 2).sum()
    y = res @ rot
    err_opq = ((y - _pq_reconstruct(y, opq_books)) ** 2).sum()
    assert err_opq < err_plain

    path = str(tmp_path / "opqres")
    write_ivfpq_index(
        emb, cents, opq_books, path, rotation=rot, residual=True
    )
    queries = emb.filter(F.col("vec_id") < 6)
    out = ivfpq_topk(
        spark, path, queries, k=5, n_probe=4, shortlist=40, embeddings=emb
    ).collect()
    by_q: dict = {}
    for r in out:
        by_q.setdefault(r["query_id"], set()).add(r["cand_id"])
    hits = sum(len(by_q[q] & set(_brute(vecs, q, 5))) for q in range(6))
    assert hits / 30 >= 0.9
