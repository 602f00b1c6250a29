"""Corpus-level term statistics and TF-IDF weighting.

Built-in-expression pipeline (explode → aggregate): term frequency,
document frequency, and TF-IDF weights over the documents table. The
integer statistics are oracle-exact; the log-weighted variant uses the
standard smoothed idf ln((N+1)/(df+1)) + 1 (scikit-learn's convention,
public knowledge) and is checked by pytest (ln is libm-dependent at the
last ulp, so it stays out of the hash-compared oracle battery).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from etl_sentinel_imagery_spark.functions.text import tokens


def term_doc_frequencies(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per term: document frequency, total occurrences, max in-doc tf."""
    term_counts = (
        docs.select(F.col(id_col).alias("doc"), F.explode(tokens(text_col)).alias("term"))
        .groupBy("doc", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    return term_counts.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"),
        F.sum("tf").alias("total_tf"),
        F.max("tf").alias("max_tf"),
    )


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    top_k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Okapi BM25 retrieval: top_k (doc, score, n_hits) for a bag of
    query terms — the classic lexical ranking function (Robertson &
    Zaragoza 2009), idf = ln(1 + (N − df + 0.5)/(df + 0.5)).

    Scale shape: the posting explode filters to QUERY terms before the
    (doc, term) groupBy, so the shuffle carries only matching
    occurrences, not the corpus vocabulary; per-term df is a
    |query|-row broadcast; N and avgdl are one scalar aggregate
    (collected — control-plane-sized); the final ranking is one
    map-side-combinable per-doc sum + TakeOrderedAndProject. Like
    :func:`tfidf`, the ln keeps scores out of the hash-compared oracle
    battery (libm last-ulp variance) — accuracy is pinned in pytest
    against an independent reference implementation.
    """
    q = [t for t in dict.fromkeys(query_terms)]  # dedup, keep order
    stats = docs.select(
        F.count(F.lit(1)).alias("n"),
        F.avg(F.size(tokens(text_col))).alias("avgdl"),
    ).collect()[0]
    n_docs, avgdl = stats["n"], float(stats["avgdl"])
    postings = (
        docs.select(
            F.col(id_col).alias("doc"),
            F.size(tokens(text_col)).alias("dl"),
            F.explode(tokens(text_col)).alias("term"),
        )
        .where(F.col("term").isin(q))
        .groupBy("doc", "term")
        .agg(F.count(F.lit(1)).alias("tf"), F.first("dl").alias("dl"))
    )
    dfreq = postings.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(
        1.0
        + (F.lit(n_docs) - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    norm = F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.lit(avgdl)
    )
    contrib = idf * (
        F.col("tf") * F.lit(k1 + 1.0) / (F.col("tf") + norm)
    )
    return (
        postings.join(F.broadcast(dfreq), "term")
        .groupBy("doc")
        .agg(
            F.sum(contrib).alias("score"),
            F.count(F.lit(1)).alias("n_hits"),
        )
        .orderBy(F.desc("score"), "doc")
        .limit(top_k)
    )


def tfidf(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc, term, tf, df, tfidf) with smoothed log idf."""
    n_docs = docs.count()
    term_counts = (
        docs.select(F.col(id_col).alias("doc"), F.explode(tokens(text_col)).alias("term"))
        .groupBy("doc", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = term_counts.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    return term_counts.join(F.broadcast(dfreq), "term").select(
        "doc",
        "term",
        "tf",
        "df",
        (
            F.col("tf")
            * (F.log((F.lit(n_docs) + 1.0) / (F.col("df") + 1.0)) + 1.0)
        ).alias("tfidf"),
    )


def bm25_topk_multi(
    docs: DataFrame,
    queries: DataFrame,
    top_k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    terms_col: str = "terms",
) -> DataFrame:
    """Batched BM25: serve a whole TABLE of queries (``query_id``,
    ``terms array<string>``) with ONE corpus scan — the multi-tenant
    form of :func:`bm25_topk` (identical scoring formula; pinned equal
    in pytest).

    Scale shape: the union of all query terms broadcasts into the
    posting filter, so the corpus explodes once regardless of the
    number of queries; per-term df and the (query, term) fan-out join
    are both |query-vocabulary|-row broadcasts; the per-(query, doc)
    score sum is map-side combinable. Per-query top-k uses the
    engine's bounded two-phase idiom (brute_force_topk_gemm,
    similarity.py): an Arrow-batched per-PARTITION top-k (heap across
    batches, emits ≤ queries × k rows per partition) feeds a final
    window over ≤ partitions × queries × k rows — never a
    corpus-sized window partition.
    """
    import heapq
    from typing import Iterator as _Iter

    import pandas as _pd

    stats = docs.select(
        F.count(F.lit(1)).alias("n"),
        F.avg(F.size(tokens(text_col))).alias("avgdl"),
    ).collect()[0]
    n_docs, avgdl = stats["n"], float(stats["avgdl"])

    qterms = (
        queries.select(
            F.col(query_id_col).alias("qid"),
            F.explode(F.array_distinct(F.col(terms_col))).alias("term"),
        )
        .distinct()
    )
    all_terms = qterms.select("term").distinct()
    postings = (
        docs.select(
            F.col(id_col).alias("doc"),
            F.size(tokens(text_col)).alias("dl"),
            F.explode(tokens(text_col)).alias("term"),
        )
        .join(F.broadcast(all_terms), "term", "left_semi")
        .groupBy("doc", "term")
        .agg(F.count(F.lit(1)).alias("tf"), F.first("dl").alias("dl"))
    )
    dfreq = postings.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(
        1.0
        + (F.lit(n_docs) - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    norm = F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.lit(avgdl)
    )
    contrib = idf * (
        F.col("tf") * F.lit(k1 + 1.0) / (F.col("tf") + norm)
    )
    scored = (
        postings.join(F.broadcast(dfreq), "term")
        .join(F.broadcast(qterms), "term")
        .groupBy("qid", "doc")
        .agg(
            F.sum(contrib).alias("score"),
            F.count(F.lit(1)).alias("n_hits"),
        )
    )

    def _local_topk(batches: _Iter[_pd.DataFrame]) -> _Iter[_pd.DataFrame]:
        heaps: dict = {}
        for pdf in batches:
            for qid, doc, score, n_hits in zip(
                pdf["qid"], pdf["doc"], pdf["score"], pdf["n_hits"]
            ):
                h = heaps.setdefault(qid, [])
                # min-heap on (score, -doc): evict the worst; -doc makes
                # the LARGER doc id the loser on score ties, matching
                # the final window's (score desc, doc asc) order
                item = (float(score), -int(doc), int(doc), int(n_hits))
                if len(h) < top_k:
                    heapq.heappush(h, item)
                elif item > h[0]:
                    heapq.heapreplace(h, item)
        rows = [
            (int(qid), doc, score, n_hits)
            for qid, h in heaps.items()
            for (score, _negdoc, doc, n_hits) in h
        ]
        yield _pd.DataFrame(
            rows, columns=["qid", "doc", "score", "n_hits"]
        )

    local = scored.mapInPandas(
        _local_topk, "qid long, doc long, score double, n_hits long"
    )
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("doc"))
    return (
        local.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= top_k)
        .select(
            F.col("qid").alias(query_id_col),
            "doc",
            "score",
            "n_hits",
            "rnk",
        )
    )
