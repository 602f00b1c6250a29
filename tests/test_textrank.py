"""TF-IDF operator tests (log idf stays out of the oracle battery)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from etl_sentinel_imagery_spark.operators.textrank import term_doc_frequencies, tfidf
from etl_sentinel_imagery_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_tfidf_golden_small(spark):
    docs = spark.createDataFrame(
        [(1, "a b a"), (2, "a c"), (3, "d d d")],
        "doc_id bigint, text string",
    )
    out = {(r["doc"], r["term"]): r for r in tfidf(docs).collect()}
    n = 3
    # 'a' appears in 2 docs; tf in doc1 = 2
    r = out[(1, "a")]
    assert r["tf"] == 2 and r["df"] == 2
    assert math.isclose(r["tfidf"], 2 * (math.log((n + 1) / (2 + 1)) + 1.0))
    # 'd': tf 3, df 1
    r = out[(3, "d")]
    assert math.isclose(r["tfidf"], 3 * (math.log(2.0) + 1.0))
    assert (2, "b") not in out


def test_term_stats_consistency(spark):
    docs = load_table(spark, SF_DIR, "documents")
    stats = term_doc_frequencies(docs)
    n_docs = docs.count()
    top = stats.orderBy(F.desc("df"), "term").first()
    assert top["df"] <= n_docs
    assert top["total_tf"] >= top["df"]  # each contributing doc has ≥1
    assert top["max_tf"] >= 1
