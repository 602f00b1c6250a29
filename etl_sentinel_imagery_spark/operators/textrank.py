"""Corpus-level term statistics and TF-IDF weighting.

Built-in-expression pipeline (explode → aggregate): term frequency,
document frequency, and TF-IDF weights over the documents table. The
integer statistics are oracle-exact; the log-weighted variant uses the
standard smoothed idf ln((N+1)/(df+1)) + 1 (scikit-learn's convention,
public knowledge) and is checked by pytest (ln is libm-dependent at the
last ulp, so it stays out of the hash-compared oracle battery).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
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
