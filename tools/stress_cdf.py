"""Scale-path stress: streaming CDF source over a LONG manifest chain
with deletion-vector commits mixed in.

Builds a txlog table through ``n_commits`` versions (appends + a DV
delete every 5th commit + a compaction mid-chain), then tails the
whole history with ``cdf_step`` in ``max_versions``-sized chunks into
an additive fold. Claims probed:

- **resolution stays bounded on a long chain** — every snapshot /
  table_changes resolves through at most CHECKPOINT_EVERY delta
  manifests (the embedded-checkpoint design), measured as per-batch
  wall staying flat across the chain instead of growing with the
  version number;
- **batch cost tracks the delta** — each chunk reads only its
  commits' touched files (small appends → small batches, however
  large the table has grown);
- **the fold is exact** — insert-minus-delete over the entire feed
  equals the final snapshot, DV commits included, across the
  compaction skip.

Usage: python tools/stress_cdf.py [n_commits] [rows_per_commit]
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
    append,
    compact,
    current_version,
    delete_rows_dv,
    init_table,
    snapshot,
)
from etl_sentinel_imagery_spark.session import get_spark
from etl_sentinel_imagery_spark.streaming.cdf_source import cdf_step


def main() -> None:
    n_commits = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    rows_per = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
    mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g")
    spark = get_spark(
        "stress_cdf", extra_conf={"spark.driver.memory": mem}
    )
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="stress_cdf_")
    t = os.path.join(root, "table")
    ckpt = os.path.join(root, "ckpt")

    def seed(offset):
        return spark.range(offset, offset + rows_per).select(
            F.col("id").alias("doc_id"),
            (F.col("id") % 11).cast("int").alias("grp"),
        )

    t0 = time.time()
    init_table(spark, t, seed(0).coalesce(1))
    n_deleted = 0
    for i in range(1, n_commits):
        if i == n_commits // 2 + 1:
            compact(spark, t, target_files=4)
        elif i % 5 == 0:
            # delete 3 keys from the PREVIOUS commit's range
            base = (i - 1) * rows_per
            delete_rows_dv(
                spark, t, "doc_id", [base, base + 1, base + 2]
            )
            n_deleted += 3
        else:
            append(spark, t, seed(i * rows_per).coalesce(1))
    build_wall = time.time() - t0
    v_final = current_version(t)
    print(
        f"built chain: {v_final + 1} versions in {build_wall:.1f}s "
        f"({build_wall / (v_final + 1) * 1000:.0f} ms/commit)"
    )

    # tail the full history in chunks; fold insert-delete counts
    fold = {"insert": 0, "delete": 0}
    batch_walls = []
    while True:
        t1 = time.time()
        done = {"r": None}

        def proc(df, rng):
            counts = {
                r["_change_type"]: r["n"]
                for r in df.groupBy("_change_type")
                .agg(F.count(F.lit(1)).alias("n"))
                .collect()
            }
            done["r"] = counts

        r = cdf_step(spark, t, ckpt, proc, max_versions=10)
        if r is None:
            break
        for k, v in (done["r"] or {}).items():
            fold[k] += v
        batch_walls.append(time.time() - t1)
    early = sum(batch_walls[:3]) / 3
    late = sum(batch_walls[-3:]) / 3
    print(
        f"tailed {len(batch_walls)} chunks of <=10 versions: "
        f"first-3 avg {early:.2f}s, last-3 avg {late:.2f}s "
        f"(flat ⇒ bounded resolution), total "
        f"{sum(batch_walls):.1f}s"
    )
    live = snapshot(spark, t).count()
    net = fold["insert"] - fold["delete"]
    print(
        f"fold: +{fold['insert']} -{fold['delete']} = {net}; "
        f"snapshot = {live}"
    )
    assert net == live, "feed fold must equal the live snapshot"
    # late batches must not balloon vs early ones (bounded replay);
    # 3x headroom over machine noise
    assert late < max(3 * early, early + 2.0), (
        f"per-batch wall grew along the chain: {early:.2f}s -> {late:.2f}s"
    )
    shutil.rmtree(root, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
