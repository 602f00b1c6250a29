"""Scale-path stress: ROW TRACKING at 1M rows.

Claims probed, each a 100 TB design property measured rather than
narrated:

- **enablement is metadata-only** — `enable_row_tracking` on a
  1M-row / 16-file table must take manifest-write time (no data
  jobs), asserted both by wall and by Spark job count;
- **id reads are one scan** — `snapshot_rowids` full uniqueness
  check at 1M (ids dense 0..n-1 after enablement);
- **clause-form MERGE scales with the delta** — a 50k-update +
  tombstone-delete + 50k-insert merge against 1M rows, probe pruned
  by manifest stats; ids of untouched rows provably stable (sampled
  anti-check via row_changes netting);
- **row_changes cost tracks TOUCHED files** — after the merge, the
  diff reads only changed entries; wall printed beside a full-table
  rewrite diff (compact) for contrast.

Usage: python tools/stress_rowids.py [n_rows]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import shutil
import tempfile

from pyspark.sql import functions as F

from etl_sentinel_imagery_spark.operators.txlog import (
    compact,
    current_version,
    enable_row_tracking,
    init_table,
    merge,
    resolve_row_tracking,
    row_changes,
    snapshot_rowids,
)
from etl_sentinel_imagery_spark.session import get_spark


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g")
    spark = get_spark(
        "stress_rowids", extra_conf={"spark.driver.memory": mem}
    )
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    root = tempfile.mkdtemp(prefix="stress_rid_")
    t = os.path.join(root, "t")

    def seed(lo, n, tag):
        return spark.range(lo, lo + n).select(
            F.col("id").alias("doc_id"),
            (F.col("id") % 17).cast("int").alias("grp"),
            F.concat(F.lit(tag), F.col("id")).alias("body"),
        )

    t0 = time.time()
    init_table(
        spark, t, seed(0, n_rows, "v0-").repartition(16),
        stat_cols=["doc_id"],
    )
    print(f"init: {n_rows} rows / 16 files in {time.time() - t0:.1f}s")

    # -- enablement: metadata-only --------------------------------
    tracker = sc.statusTracker()
    jobs_before = len(tracker.getJobIdsForGroup(None) or [])
    t0 = time.time()
    enable_row_tracking(t)
    w_enable = time.time() - t0
    jobs_after = len(tracker.getJobIdsForGroup(None) or [])
    print(
        f"enable_row_tracking: {w_enable * 1000:.0f} ms, "
        f"spark jobs run: {jobs_after - jobs_before}"
    )
    assert jobs_after == jobs_before, "enablement must not run jobs"

    # -- one-scan id read + uniqueness at 1M ----------------------
    t0 = time.time()
    ids = snapshot_rowids(spark, t)
    n_ids = ids.select("_row_id").distinct().count()
    w_read = time.time() - t0
    assert n_ids == n_rows, n_ids
    lo_hi = ids.agg(
        F.min("_row_id").alias("lo"), F.max("_row_id").alias("hi")
    ).collect()[0]
    assert (lo_hi["lo"], lo_hi["hi"]) == (0, n_rows - 1)
    print(f"snapshot_rowids distinct-count at 1M: {w_read:.1f}s (dense)")

    # -- clause merge at 1M: 50k updates + tombstones + 50k inserts
    v0 = current_version(t)
    src = (
        spark.range(200_000, 300_000)
        .select(
            F.col("id").alias("doc_id"),
            (F.col("id") % 17).cast("int").alias("grp"),
            F.concat(F.lit("m-"), F.col("id")).alias("body"),
            (F.col("id") % 2 == 0).alias("tomb"),
        )
        .unionByName(
            spark.range(n_rows, n_rows + 50_000).select(
                F.col("id").alias("doc_id"),
                (F.col("id") % 17).cast("int").alias("grp"),
                F.concat(F.lit("new-"), F.col("id")).alias("body"),
                F.lit(False).alias("tomb"),
            )
        )
    )
    t0 = time.time()
    merge(
        spark,
        t,
        src,
        "doc_id",
        when_matched=[
            ("delete", "s.tomb"),
            ("update", None, {"body": "s.body"}),
        ],
        when_not_matched=[("insert", "NOT s.tomb")],
    )
    w_merge = time.time() - t0
    wm = resolve_row_tracking(t)["watermark"]
    print(
        f"clause merge (50k del + 50k upd + 50k ins) at 1M: "
        f"{w_merge:.1f}s, watermark={wm}"
    )

    # -- row_changes tracks the touched files ---------------------
    t0 = time.time()
    ch = row_changes(spark, t, v0)
    counts = {
        r["_change_type"]: r["n"]
        for r in ch.groupBy("_change_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    w_diff = time.time() - t0
    print(f"row_changes after merge: {w_diff:.1f}s → {counts}")
    assert counts["delete"] == 50_000, counts
    assert counts["insert"] == 50_000, counts
    assert (
        counts["update_preimage"] == counts["update_postimage"] == 50_000
    ), counts
    # uniqueness after the merge (updates preserved, inserts fresh)
    n_now = snapshot_rowids(spark, t).count()
    n_uni = snapshot_rowids(spark, t).select("_row_id").distinct().count()
    assert n_now == n_uni == n_rows, (n_now, n_uni)

    # -- contrast: a full rewrite, then the NET diff still only
    #    reflects real changes (and pays the rewritten files)
    v1 = current_version(t)
    t0 = time.time()
    compact(spark, t, target_files=16)
    w_compact = time.time() - t0
    t0 = time.time()
    n_net = row_changes(spark, t, v1).count()
    w_net = time.time() - t0
    assert n_net == 0, n_net
    print(
        f"compact(16) with materialized ids: {w_compact:.1f}s; "
        f"row_changes across the rewrite: {w_net:.1f}s, 0 net rows"
    )

    shutil.rmtree(root, ignore_errors=True)
    spark.stop()
    print("OK")


if __name__ == "__main__":
    main()
