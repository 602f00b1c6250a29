"""Scale evidence for the index-as-derived-table claim: at 1M vectors,
an incremental sync of a small churn range must cost a small fraction
of the full rebuild it replaces — and the synced corpus must equal the
table snapshot exactly.

Usage: python tools/stress_index_sync.py [n_vectors] [churn] [--pq]

``--pq`` builds the compressed tier too (round-8: the last tier
refusal removed) and reports its per-sync wall beside the IVF leg's,
plus the PQ-corpus == table-ids invariant.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--pq"]
    with_pq = "--pq" in sys.argv[1:]
    n = int(args[0]) if len(args) > 0 else 1_000_000
    churn = int(args[1]) if len(args) > 1 else 10_000
    from pyspark.sql import SparkSession, functions as F

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from etl_sentinel_imagery_spark.operators.txlog import (
        append,
        delete_rows_dv,
        init_table,
        snapshot,
    )
    from etl_sentinel_imagery_spark.plans.serving import (
        build_index_from_table,
        sync_index_from_table,
    )

    base = tempfile.mkdtemp(prefix="stress_idx_sync_")
    t = os.path.join(base, "table")
    idx = os.path.join(base, "index")
    dim = 32

    def vecs(lo, hi, shift=0.0):
        # per-dimension multipliers keep the vector population rich
        # (a single shared cycle would collapse every delete into one
        # bucket and flatter the rewrite path)
        return spark.range(lo, hi).select(
            F.col("id").alias("vec_id"),
            F.expr(
                f"transform(sequence(0, {dim - 1}), "
                f"d -> cast(pmod(id * (7 + d) + d * 13, 997) as double)"
                f" / 997.0 + {shift})"
            ).alias("embedding"),
        )

    t0 = time.time()
    init_table(spark, t, vecs(0, n).repartition(32))
    seed_s = time.time() - t0
    t0 = time.time()
    build_index_from_table(
        spark, t, idx, n_centroids=64, hnsw=False,
        pq=with_pq, pq_m=8, pq_k=16,
    )
    build_s = time.time() - t0

    # churn: half fresh inserts, half GDPR deletes of existing ids
    t0 = time.time()
    append(spark, t, vecs(n + 1, n + 1 + churn // 2).coalesce(4))
    delete_rows_dv(
        spark,
        t,
        "vec_id",
        spark.range(0, churn // 2).select(
            (F.col("id") * 97 % n).alias("vec_id")
        ),
    )
    churn_s = time.time() - t0
    t0 = time.time()
    rep = sync_index_from_table(spark, t, idx)
    sync_s = time.time() - t0

    # localized churn: ids congruent mod the vector-cycle share a
    # vector class -> their rows cluster in one bucket; the rewrite
    # cost must track the LOCALITY of the churn, not the index size
    t0 = time.time()
    delete_rows_dv(
        spark,
        t,
        "vec_id",
        spark.range(0, 2000).select(
            (F.col("id") * 997 + 5).alias("vec_id")
        ),
    )
    local_churn_s = time.time() - t0
    t0 = time.time()
    rep2 = sync_index_from_table(spark, t, idx)
    local_sync_s = time.time() - t0

    t0 = time.time()
    from etl_sentinel_imagery_spark.operators.similarity import (
        read_indexed_layout,
    )

    # the COMMITTED view: since the round-7 versioned layouts, retired
    # generations stay on disk for in-flight readers (vacuum_layout's
    # job) — a raw directory read would double-count them
    n_index = (
        read_indexed_layout(spark, os.path.join(idx, "ivf"))
        .select("vec_id")
        .count()
    )
    n_table = snapshot(spark, t).count()
    pq_matches = None
    if with_pq:
        pq_ids = (
            read_indexed_layout(spark, os.path.join(idx, "ivfpq"))
            .select("vec_id")
        )
        tbl_ids = snapshot(spark, t).select("vec_id")
        pq_matches = (
            pq_ids.exceptAll(tbl_ids).count() == 0
            and tbl_ids.exceptAll(pq_ids).count() == 0
        )
    verify_s = time.time() - t0
    print(
        json.dumps(
            {
                "n_vectors": n,
                "churn": churn,
                "seed_s": round(seed_s, 1),
                "build_s": round(build_s, 1),
                "churn_commits_s": round(churn_s, 1),
                "sync_s": round(sync_s, 1),
                "sync_vs_rebuild": round(sync_s / build_s, 3),
                "buckets_rewritten": rep["buckets_rewritten"],
                "sync_walls": rep.get("walls"),
                "local_churn_commit_s": round(local_churn_s, 1),
                "local_sync_s": round(local_sync_s, 1),
                "local_buckets_rewritten": rep2["buckets_rewritten"],
                "local_sync_walls": rep2.get("walls"),
                "upserts": rep["upserts"],
                "deletes": rep["deletes"],
                "n_index": n_index,
                "n_table": n_table,
                "corpus_matches": n_index == n_table,
                "pq_corpus_matches": pq_matches,
                "verify_s": round(verify_s, 1),
            }
        )
    )
    import shutil

    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
