"""Hybrid retrieval: reciprocal-rank fusion of lexical + semantic lists.

RAG-style serving runs BOTH retrievers — BM25 (operators.textrank) for
lexical precision, ANN/exact cosine (operators.similarity, plans.
serving) for semantic recall — and fuses the ranked lists with
Reciprocal Rank Fusion (Cormack, Clarke & Buettcher 2009):

    rrf(d) = Σ_lists 1 / (k + rank_list(d))

RRF needs no score calibration between heterogeneous rankers (BM25
scores and cosines live on different scales), which is exactly why it
is the production default for hybrid search.

Scale shape: each input list is already top-k-per-query (tiny); the
fusion is a union + one map-side-combinable groupBy on
(query, candidate) + a per-query window over ≤ Σk_i candidate rows
(bounded by construction, the engine's documented bounded-window
pattern). Nothing corpus-sized moves.

Batched deployment: feed :func:`rrf_fuse` directly from the
multi-query retrievers — ``operators.textrank.bm25_topk_multi`` (one
corpus scan for a whole query table, ``rnk`` included) and
``plans.serving.topk`` (IVF/HNSW/IVF-PQ tiers, ``rnk`` included)::

    lex = bm25_topk_multi(docs, q_terms).select(
        "query_id", F.col("doc").alias("cand_id"), "rnk")
    sem = topk(spark, q_vecs, index_dir, k=40).select(
        "query_id", "cand_id", "rnk")
    fused = rrf_fuse({"bm25": lex, "ann": sem}, top_k=10)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

RRF_K = 60


def with_rank(
    df: DataFrame,
    order_cols: list,
    query_col: str | None = None,
    rank_col: str = "rnk",
) -> DataFrame:
    """Attach a dense 1-based rank ordered by ``order_cols`` (per query
    when ``query_col`` given, else globally). Intended for lists that
    are ALREADY top-k truncated — the window touches ≤ k rows per
    partition."""
    part = (
        Window.partitionBy(query_col) if query_col else Window.partitionBy()
    )
    return df.withColumn(
        rank_col, F.row_number().over(part.orderBy(*order_cols))
    )


def rrf_fuse(
    lists: dict[str, DataFrame],
    top_k: int = 10,
    k_rrf: int = RRF_K,
    query_col: str = "query_id",
    id_col: str = "cand_id",
    rank_col: str = "rnk",
) -> DataFrame:
    """Fuse named ranked lists → (query_col, id_col, rrf_score,
    n_lists, sources) top-k per query. Every input must carry
    (query_col, id_col, rank_col)."""
    tagged = None
    for name, df in lists.items():
        t = df.select(
            query_col,
            id_col,
            F.col(rank_col).alias("_r"),
            F.lit(name).alias("_src"),
        )
        tagged = t if tagged is None else tagged.unionByName(t)
    fused = tagged.groupBy(query_col, id_col).agg(
        F.sum(F.lit(1.0) / (F.lit(float(k_rrf)) + F.col("_r"))).alias(
            "rrf_score"
        ),
        F.count(F.lit(1)).alias("n_lists"),
        F.sort_array(F.collect_list("_src")).alias("sources"),
    )
    w = Window.partitionBy(query_col).orderBy(
        F.desc("rrf_score"), F.asc(id_col)
    )
    return (
        fused.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= top_k)
        .drop("_rn")
    )


def cosine_topk_single(
    embeddings: DataFrame,
    query_vec: list[float],
    top_k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k for ONE query vector as a pure expression
    scan: broadcast-literal query, fold dot product, orderBy().limit()
    (TakeOrderedAndProject — no full sort, no shuffle of vectors)."""
    import math

    qn = math.sqrt(sum(x * x for x in query_vec)) or 1.0
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    dot = F.aggregate(
        F.zip_with(
            F.col(vec_col).cast("array<double>"),
            q,
            lambda a, b: a * b,
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = F.sqrt(
        F.aggregate(
            F.col(vec_col).cast("array<double>"),
            F.lit(0.0),
            lambda acc, x: acc + x * x,
        )
    )
    return (
        embeddings.select(
            F.col(id_col).alias("cand_id"),
            (dot / (norm * F.lit(qn))).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc("cand_id"))
        .limit(top_k)
    )


def hybrid_topk_multi(
    docs: DataFrame,
    embeddings: DataFrame,
    query_terms: DataFrame,
    query_vecs: DataFrame,
    top_k: int = 10,
    fetch_k: int | None = None,
    k_rrf: int = RRF_K,
    id_col: str = "doc_id",
    text_col: str = "text",
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Batched hybrid retrieval with a SERVING-FREE exact semantic
    tier: BM25 over ``docs`` for a whole query-terms table (ONE corpus
    scan, ``bm25_topk_multi``) + exact cosine over ``embeddings`` for
    the matching query-vector table (ONE blocked-GEMM corpus pass,
    ``brute_force_topk_gemm`` — no index build), RRF-fused per query.

    This is the ad-hoc / ground-truth twin of the persisted deployment
    (``plans.serving.topk`` + ``bm25_topk_multi`` → ``rrf_fuse``): same
    fusion, same output shape, but the semantic list is exact — use it
    when no index exists yet, or to audit an index-backed hybrid's
    recall.

    ``query_terms`` carries (query_id, terms array<string>);
    ``query_vecs`` carries (query_id, vector) — ids must line up.
    Queries whose id equals a corpus ``vec_id_col`` value skip that
    self-match in the semantic list (the GEMM kernel's contract), which
    is what corpus-member "more-like-this" queries want.

    Scale shape: both retrievers are single-corpus-scan with
    control-plane-sized query broadcast; fusion moves only
    queries × fetch_k candidate rows.
    """
    from etl_sentinel_imagery_spark.operators.similarity import (
        brute_force_topk_gemm,
    )
    from etl_sentinel_imagery_spark.operators.textrank import (
        bm25_topk_multi,
    )

    fetch_k = fetch_k or 4 * top_k
    lex = bm25_topk_multi(
        docs,
        query_terms,
        top_k=fetch_k,
        id_col=id_col,
        text_col=text_col,
        query_id_col=query_id_col,
    ).select(
        F.col(query_id_col).alias("query_id"),
        F.col("doc").alias("cand_id"),
        "rnk",
    )
    sem = brute_force_topk_gemm(
        embeddings,
        query_vecs.select(
            F.col(query_id_col).alias(vec_id_col), vec_col
        ),
        k=fetch_k,
        id_col=vec_id_col,
        vec_col=vec_col,
    ).select("query_id", "cand_id", "rnk")
    return rrf_fuse(
        {"bm25": lex, "cosine": sem}, top_k=top_k, k_rrf=k_rrf
    )


def hybrid_topk(
    docs: DataFrame,
    embeddings: DataFrame,
    query_terms: list[str],
    query_vec: list[float],
    top_k: int = 10,
    fetch_k: int | None = None,
    k_rrf: int = RRF_K,
    id_col: str = "doc_id",
    text_col: str = "text",
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Single-query hybrid retrieval: BM25 over ``docs`` + exact cosine
    over ``embeddings`` (keyed to the same ids), RRF-fused. ``fetch_k``
    (default 4·top_k) sizes each retriever's list before fusion."""
    from etl_sentinel_imagery_spark.operators.textrank import bm25_topk

    fetch_k = fetch_k or 4 * top_k
    lex = with_rank(
        bm25_topk(
            docs, query_terms, top_k=fetch_k,
            id_col=id_col, text_col=text_col,
        ).select(
            F.lit(0).alias("query_id"), F.col("doc").alias("cand_id"),
            "score",
        ),
        [F.desc("score"), F.asc("cand_id")],
        query_col="query_id",
    )
    sem = with_rank(
        cosine_topk_single(
            embeddings, query_vec, top_k=fetch_k,
            id_col=vec_id_col, vec_col=vec_col,
        ).select(F.lit(0).alias("query_id"), "cand_id", "cos_sim"),
        [F.desc("cos_sim"), F.asc("cand_id")],
        query_col="query_id",
    )
    return rrf_fuse(
        {"bm25": lex, "cosine": sem}, top_k=top_k, k_rrf=k_rrf
    ).drop("query_id")
