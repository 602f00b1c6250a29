"""Scale-path stress: exact substring dedup over a synthetic corpus.

Reuses stress_minhash's Spark-side corpus generator (hash-mixed
vocabulary, 10% planted near-duplicates — a near-dup shares all but one
word with its predecessor, i.e. long exact substrings) and runs the
full positional-8-gram span pipeline. Evidence for PERF.md that the
gram shuffle + sort-merge occurrence join survive corpus scale, and
that the planted near-dups are exactly the docs that come back flagged.

Usage: python tools/stress_substring.py [n_docs]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from etl_sentinel_imagery_spark.operators.substring_dedup import (
    duplicated_span_table,
)
from etl_sentinel_imagery_spark.session import get_spark
from tools.stress_minhash import synth_docs


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "12g")
    spark = get_spark(
        "stress-substring", extra_conf={"spark.driver.memory": mem}
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = synth_docs(spark, n_docs)
    t0 = time.time()
    spans = duplicated_span_table(docs, "doc_id", "text", k=8)
    agg = spans.agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum((F.col("n_dup_spans") > 0).cast("long")).alias("flagged"),
        F.sum("dup_token_count").alias("dup_tokens"),
    ).collect()[0]
    wall = time.time() - t0
    # every planted near-dup AND its source doc carry a shared >=59-token
    # run -> both flagged; hash-accidental 8-gram repeats add a few more
    planted = docs.filter(F.col("doc_id") % 10 == 1).count()
    print(
        f"n_docs={agg['docs']} flagged={agg['flagged']} "
        f"planted_near_dups={planted} dup_tokens={agg['dup_tokens']} "
        f"wall={wall:.1f}s docs_per_sec={n_docs / wall:.0f}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
