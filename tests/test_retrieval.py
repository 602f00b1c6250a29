from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from etl_sentinel_imagery_spark.operators.retrieval import (
    cosine_topk_single,
    hybrid_topk,
    rrf_fuse,
    with_rank,
)


def test_rrf_fuse_matches_bruteforce(spark):
    """Fusion must equal the hand-computed RRF formula, including the
    multi-list bonus and deterministic tiebreak."""
    a = spark.createDataFrame(
        [(0, 1, 1), (0, 2, 2), (0, 3, 3), (1, 9, 1)],
        ["query_id", "cand_id", "rnk"],
    )
    b = spark.createDataFrame(
        [(0, 2, 1), (0, 4, 2), (1, 8, 1)],
        ["query_id", "cand_id", "rnk"],
    )
    out = rrf_fuse({"a": a, "b": b}, top_k=10, k_rrf=60).collect()
    got = {(r["query_id"], r["cand_id"]): r for r in out}

    def rrf(*ranks):
        return sum(1.0 / (60 + r) for r in ranks)

    assert math.isclose(got[(0, 2)]["rrf_score"], rrf(2, 1))
    assert math.isclose(got[(0, 1)]["rrf_score"], rrf(1))
    assert got[(0, 2)]["n_lists"] == 2
    assert got[(0, 2)]["sources"] == ["a", "b"]
    # doc 2 (both lists) beats doc 1 (rank 1 in one list)
    q0 = sorted(
        (r for r in out if r["query_id"] == 0),
        key=lambda r: -r["rrf_score"],
    )
    assert q0[0]["cand_id"] == 2
    # per-query isolation
    assert {r["cand_id"] for r in out if r["query_id"] == 1} == {8, 9}


def test_rrf_top_k_truncation_and_ties(spark):
    a = spark.createDataFrame(
        [(0, i, i) for i in range(1, 6)], ["query_id", "cand_id", "rnk"]
    )
    out = rrf_fuse({"a": a}, top_k=3).collect()
    assert [r["cand_id"] for r in sorted(out, key=lambda r: -r["rrf_score"])] == [1, 2, 3]


def test_cosine_topk_single_exact(spark):
    rows = [
        (1, [1.0, 0.0]),
        (2, [0.9, 0.1]),
        (3, [0.0, 1.0]),
        (4, [-1.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = cosine_topk_single(df, [1.0, 0.0], top_k=2).collect()
    assert [r["cand_id"] for r in out] == [1, 2]
    assert math.isclose(out[0]["cos_sim"], 1.0, abs_tol=1e-12)
    want2 = 0.9 / math.sqrt(0.9**2 + 0.1**2)
    assert math.isclose(out[1]["cos_sim"], want2, rel_tol=1e-12)


def test_hybrid_finds_both_modalities(spark):
    """A doc that is lexically perfect and one that is semantically
    perfect both surface; the doc good at BOTH wins."""
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),        # lexical + semantic
            (2, "alpha beta unrelated words"),    # lexical only
            (3, "nothing matching here at all"),  # semantic only
            (4, "totally irrelevant document x"),
        ],
        ["doc_id", "text"],
    )
    emb = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),
            (2, [0.0, 1.0]),
            (3, [0.95, 0.05]),
            (4, [-1.0, 0.0]),
        ],
        ["vec_id", "embedding"],
    )
    out = hybrid_topk(
        docs, emb, ["alpha", "beta"], [1.0, 0.0], top_k=3
    ).collect()
    ranked = [
        r["cand_id"] for r in sorted(out, key=lambda r: -r["rrf_score"])
    ]
    assert ranked[0] == 1
    assert set(ranked) == {1, 2, 3}
    both = next(r for r in out if r["cand_id"] == 1)
    assert both["n_lists"] == 2 and both["sources"] == ["bm25", "cosine"]


def test_with_rank_is_bounded_window(spark):
    df = spark.createDataFrame(
        [(0, 5, 0.9), (0, 6, 0.8), (1, 5, 0.7)],
        ["query_id", "cand_id", "score"],
    )
    out = with_rank(
        df, [F.desc("score"), F.asc("cand_id")], query_col="query_id"
    ).collect()
    got = {(r["query_id"], r["cand_id"]): r["rnk"] for r in out}
    assert got[(0, 5)] == 1 and got[(0, 6)] == 2 and got[(1, 5)] == 1


def test_hybrid_topk_multi_exact_tier(spark):
    """Serving-free batched hybrid: the semantic tier is the exact
    GEMM pass, so a query whose vector is corpus member m must carry
    m's nearest NON-SELF neighbors exactly as cosine ranks; lexical
    anchors still surface; fusion shape matches the indexed variant."""
    from pyspark.sql import functions as F

    from etl_sentinel_imagery_spark.operators.retrieval import (
        hybrid_topk_multi,
    )
    from etl_sentinel_imagery_spark.operators.similarity import (
        brute_force_topk,
    )
    from etl_sentinel_imagery_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    docs = load_table(spark, sf, "documents")
    emb = load_table(spark, sf, "embeddings")

    qvecs = emb.filter(F.col("vec_id").isin(3, 7)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    qterms = spark.createDataFrame(
        [(3, ["table", "row"]), (7, ["spark", "merge"])],
        "query_id long, terms array<string>",
    )
    fused = hybrid_topk_multi(
        docs, emb, qterms, qvecs, top_k=10, fetch_k=20
    ).collect()
    by_q = {}
    for r in fused:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == {3, 7}
    for rows in by_q.values():
        assert 1 <= len(rows) <= 10
        srcs = {s for r in rows for s in r["sources"]}
        assert srcs == {"bm25", "cosine"}

    # the semantic contribution is EXACT: candidates fused from the
    # cosine list for query 3 must be a prefix-set of the fold-anchor
    # exact top-k (self excluded by the kernel contract)
    anchor = {
        r["cand_id"]
        for r in brute_force_topk(emb, F.col("vec_id") == 3, k=20).collect()
    }
    got_sem = {
        r["cand_id"]
        for r in fused
        if r["query_id"] == 3 and "cosine" in r["sources"]
    }
    assert got_sem <= anchor
    assert 3 not in got_sem  # no self-match


def test_batched_hybrid_composition_e2e(spark, tmp_path):
    """The documented batched deployment: bm25_topk_multi + serving
    topk → rrf_fuse. A query whose vector IS a corpus member must get
    that member as semantic rank 1; a query with lexical anchors gets
    its term-bearing docs; docs surfaced by both retrievers carry
    n_lists=2."""
    from pyspark.sql import functions as F

    from etl_sentinel_imagery_spark.operators.retrieval import rrf_fuse
    from etl_sentinel_imagery_spark.operators.textrank import (
        bm25_topk_multi,
    )
    from etl_sentinel_imagery_spark.plans.serving import (
        build_serving_index,
        topk,
    )
    from etl_sentinel_imagery_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    docs = load_table(spark, sf, "documents")
    emb = load_table(spark, sf, "embeddings")
    idx = str(tmp_path / "ann")
    build_serving_index(emb, idx, n_centroids=8, hnsw=False)

    # two queries: vectors of corpus members 3 and 7
    qvecs = emb.filter(F.col("vec_id").isin(3, 7)).select(
        "vec_id", "embedding"
    )
    sem = topk(
        spark, qvecs, idx, k=20, tier="ivf", n_probe=8
    ).select("query_id", "cand_id", "rnk")

    qterms = spark.createDataFrame(
        [(3, ["table", "row"]), (7, ["spark", "merge"])],
        "query_id long, terms array<string>",
    )
    lex = bm25_topk_multi(docs, qterms, top_k=20).select(
        "query_id", F.col("doc").alias("cand_id"), "rnk"
    )
    fused = rrf_fuse({"bm25": lex, "ann": sem}, top_k=10).collect()
    by_q = {}
    for r in fused:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == {3, 7}
    for qid, rows in by_q.items():
        assert 1 <= len(rows) <= 10
        srcs = {s for r in rows for s in r["sources"]}
        assert srcs == {"ann", "bm25"}  # both modalities contribute
