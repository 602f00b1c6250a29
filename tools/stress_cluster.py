"""Incremental clustering at 1M rows: the cluster_table cost claim
measured, not narrated.

Scenario: a 1M-row table clustered on (a, b), then steady ingest —
small appends landing beside the clustered generations. Compare:

  1. FULL recluster (optimize zorder_by — rewrites the whole table
     every pass, the pre-round-10 tool);
  2. INCREMENTAL cluster_table over the same churn (rewrites ONLY the
     unclustered appends).

The 100 TB contract is that (2) tracks the CHURN size while (1)
tracks the TABLE size — at a realistic churn ratio the wall gap is
the whole argument for the cluster.by property. Also verifies: row
content bit-stable through both passes (integer signatures), every
live entry stamped with the spec afterwards, and per-file stats spans
on the clustered column collapse vs the unclustered appends.

Usage: python tools/stress_cluster.py [n_rows] [n_churn_appends]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def main(n=1_000_000, churn_appends=8):
    from pyspark.sql import SparkSession, functions as F

    from etl_sentinel_imagery_spark.operators.txlog import (
        append,
        cluster_table,
        current_version,
        init_table,
        optimize,
        resolve_files,
        snapshot,
    )

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    def seed(lo, hi):
        return spark.range(lo, hi).select(
            F.col("id").alias("k"),
            ((F.col("id") * 2654435761) % 1_000_003).alias("a"),
            ((F.col("id") * 40503) % 999_983).alias("b"),
        )

    def sig(df):
        r = df.agg(
            F.count(F.lit(1)),
            F.sum("k"),
            F.sum("a"),
            F.sum("b"),
        ).collect()[0]
        return tuple(int(x) for x in r)

    root = tempfile.mkdtemp(prefix="stress_cluster_")
    t = os.path.join(root, "t")
    init_table(spark, t, seed(0, n).repartition(16), stat_cols=["a", "b"])

    t0 = time.time()
    v, stats = cluster_table(spark, t, cols=["a", "b"])
    w_initial = time.time() - t0
    print(
        f"initial cluster of {n} rows: {w_initial:.1f}s "
        f"({stats['files_clustered']} files in, "
        f"{stats['files_written']} out)"
    )
    s0 = sig(snapshot(spark, t))

    # steady ingest: churn lands unclustered beside the generations
    per = max(1, n // 200)  # 0.5% of the table per append
    for i in range(churn_appends):
        append(
            spark, t,
            seed(10 * n + i * per, 10 * n + (i + 1) * per).coalesce(1),
        )
    s1 = sig(snapshot(spark, t))

    t0 = time.time()
    v, stats = cluster_table(spark, t, cols=["a", "b"])
    w_inc = time.time() - t0
    assert stats["files_clustered"] == churn_appends, stats
    entries = resolve_files(t)
    assert all(e.get("clustered") == "a,b" for e in entries)
    assert sig(snapshot(spark, t)) == s1, "content drifted"
    print(
        f"incremental pass over {churn_appends} appends "
        f"({churn_appends * per} rows, "
        f"{100 * churn_appends * per / n:.1f}% churn): {w_inc:.1f}s"
    )

    # the pre-round-10 alternative: full zorder relayout every pass
    t0 = time.time()
    optimize(spark, t, zorder_by=["a", "b"], target_files=16)
    w_full = time.time() - t0
    assert sig(snapshot(spark, t)) == s1, "content drifted (full)"
    print(f"full optimize-zorder relayout: {w_full:.1f}s")
    print(
        f"incremental/full ratio: {w_inc / w_full:.2f} "
        f"(churn ratio {churn_appends * per / n:.3f})"
    )

    # stats spans: clustered files must cover narrow 'a' ranges
    spans = [
        (e["stats"]["a"][1] - e["stats"]["a"][0]) / 1_000_003
        for e in resolve_files(t)
        if "stats" in e and "a" in e["stats"]
    ]
    print(
        f"per-file normalized 'a' span after full recluster: "
        f"mean {sum(spans) / len(spans):.3f} over {len(spans)} files"
    )
    shutil.rmtree(root)


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    c = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    main(n, c)
