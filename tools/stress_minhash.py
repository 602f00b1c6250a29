"""Scale-path stress: MinHash-LSH dedup over a self-generated corpus.

Synthesizes N documents Spark-side (no driver materialization): a base
corpus of vocabulary-sampled docs plus a controlled fraction of near-
duplicates (one word substituted), then runs the full shingle→minhash→
band→bucket-join pipeline and reports wall time + pair counts. This is
the evidence run for PERF.md's claim that the LSH shuffle stays linear
in corpus size.

Usage: python tools/stress_minhash.py [n_docs]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from etl_sentinel_imagery_spark.operators.dedup import minhash_lsh_pairs
from etl_sentinel_imagery_spark.session import get_spark

VOCAB = (
    "the a of and spark table join scan hash merge sort window batch stream "
    "query filter group agg row column key value part order line fast slow "
    "big small data set dup near exact shard block chunk"
).split()


def synth_docs(spark, n_docs: int, words_per_doc: int = 60, dup_frac: float = 0.1):
    """Deterministic corpus: doc i's words are vocab[(i*7 + j*13) % V];
    every 1/dup_frac-th doc is a near-copy of its predecessor with one
    substituted word."""
    v = len(VOCAB)
    vocab_arr = F.array(*[F.lit(w) for w in VOCAB])

    def word_at(doc_id_col, j):
        # hash-mixed word choice: deterministic but collision-free across
        # doc ids (a linear formula cycles and makes whole doc groups
        # identical → quadratic LSH buckets — realistic only for
        # worst-case boilerplate corpora)
        idx = F.pmod(F.xxhash64(doc_id_col, j), F.lit(v)) + 1
        return F.element_at(vocab_arr, idx.cast("int"))

    base = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(0), F.lit(words_per_doc - 1)),
                lambda j: word_at(F.col("id"), j),
            ),
        ).alias("text"),
    )
    step = max(int(1 / dup_frac), 2)
    dup = F.col("doc_id") % step == 1
    prev_words = F.transform(
        F.sequence(F.lit(0), F.lit(words_per_doc - 1)),
        lambda j: word_at(F.col("doc_id") - 1, j),
    )
    near_copy = F.concat_ws(
        " ", F.concat(F.slice(prev_words, 1, words_per_doc - 1), F.array(F.lit("zzz")))
    )
    return base.select(
        "doc_id", F.when(dup, near_copy).otherwise(F.col("text")).alias("text")
    )


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    # The bench keeps the JVM-default 1g heap (measured faster there);
    # this harness pushes 20x the bench corpus through 32 concurrent
    # tasks, where 1g OOMs in the clustering phase — size the heap to
    # the job. SPARK_GRAFT_DRIVER_MEM still overrides.
    mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "12g")
    spark = get_spark(
        "stress-minhash", extra_conf={"spark.driver.memory": mem}
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = synth_docs(spark, n_docs)
    docs.count()  # materialize generation outside the timed window? No —
    # generation is trivially cheap; time the full pipeline honestly:
    t0 = time.time()
    pairs = minhash_lsh_pairs(docs, "doc_id", "text")
    n_pairs = pairs.count()
    wall = time.time() - t0
    n_expected_dups = docs.filter(F.col("doc_id") % 10 == 1).count()
    print(
        f"n_docs={n_docs} lsh_candidate_pairs={n_pairs} "
        f"planted_near_dups={n_expected_dups} wall={wall:.1f}s "
        f"docs_per_sec={n_docs / wall:.0f}"
    )

    # Mega-bucket scenario: 20% of the corpus is ONE boilerplate doc.
    # Uncapped this bucket alone is (n/5)^2/2 pairs; the MAX_BUCKET guard
    # must keep the candidate count near the healthy-corpus level.
    boiler_frac = 5
    mega = docs.withColumn(
        "text",
        F.when(
            F.col("doc_id") % boiler_frac == 0, F.lit("boilerplate footer " * 20)
        ).otherwise(F.col("text")),
    )
    t0 = time.time()
    n_capped = minhash_lsh_pairs(mega, "doc_id", "text").count()
    wall_capped = time.time() - t0
    n_boiler = n_docs // boiler_frac
    quad = n_boiler * (n_boiler - 1) // 2
    print(
        f"mega-bucket corpus: boiler_docs={n_boiler} "
        f"uncapped_floor={quad} capped_pairs={n_capped} "
        f"wall={wall_capped:.1f}s (dropped buckets bounded the join: "
        f"{'OK' if n_capped < quad / 10 else 'STILL QUADRATIC'})"
    )

    # Full dedup recipe: candidates → verify → connected components.
    # Label propagation must converge in a few rounds on near-clique
    # dup clusters, and wall time stays join-dominated, not iteration-
    # dominated.
    from etl_sentinel_imagery_spark.operators.dedup import dedup_clusters

    t0 = time.time()
    clusters = dedup_clusters(docs, "doc_id", "text")
    n_canonical = clusters.filter("is_canonical").count()
    n_total = clusters.count()
    wall_cluster = time.time() - t0
    print(
        f"dedup_clusters: docs={n_total} canonical={n_canonical} "
        f"removed={n_total - n_canonical} wall={wall_cluster:.1f}s"
    )
    spark.stop()


if __name__ == "__main__":
    main()
