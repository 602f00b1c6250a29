"""Scale-path stress: the rid-diff CHANGE FEED under a 1M-row bulk
UPDATE — the round-7 verdict's unrecorded measurement (#6).

The claim under test (round-6 verdict #1's fix): on a ROW-TRACKED
table, a rewrite commit plans ONE feed partition per touched file —
rid_add/rid_remove netting by stable row id, parallel IO like the
append path — instead of funneling the whole diff through a single
task. This run proves it with a number:

- table A (row tracking ON): 1M rows across ``n_files`` files, one
  bulk ``UPDATE`` touching every file (k % 2 = 0 → half the rows
  rewrite, half carry over). The feed must emit exactly
  updated_rows × 2 change rows (delete+insert pairs; carried-over
  rows net away), plan ≥ n_files rid partitions, and its wall is the
  distributed-path cost.
- table B (row tracking OFF, same data, same update): the only
  admissible plan is the single-task multiset diff (``maxDiffRows``
  raised to admit it — the default guard would refuse, which is
  itself the scale posture). Same row-exactness, single partition,
  funnel wall.

Usage: python tools/stress_rid_feed.py [n_rows] [n_files]
Prints one JSON line; PERF.md records it.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F

from etl_sentinel_imagery_spark.operators.txlog import (
    current_version,
    enable_row_tracking,
    init_table,
    update_rows,
)
from etl_sentinel_imagery_spark.session import get_spark
from etl_sentinel_imagery_spark.sources.txlog_stream import (
    plan_change_partitions,
    register,
)


def _seed(spark, n):
    return spark.range(n).select(
        F.col("id").alias("k"),
        (F.col("id") * 3).alias("v"),
        F.concat(F.lit("pad-"), F.col("id")).alias("pad"),
    )


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g")
    spark = get_spark(
        "stress_rid_feed", extra_conf={"spark.driver.memory": mem}
    )
    register(spark)
    binds = {"k": "k", "v": "v", "pad": "pad"}
    out: dict = {"n_rows": n_rows, "n_files": n_files}

    work = tempfile.mkdtemp(prefix="rid_feed_")
    try:
        for label, tracked in (("rid", True), ("untracked", False)):
            d = os.path.join(work, label)
            init_table(spark, d, _seed(spark, n_rows).repartition(n_files))
            if tracked:
                enable_row_tracking(d)
            v0 = current_version(d)
            t0 = time.time()
            update_rows(spark, d, "k % 2 = 0", {"v": "v + 1"})
            commit_wall = time.time() - t0

            t0 = time.time()
            kw = {} if tracked else {"max_diff_rows": n_rows * 4}
            parts = plan_change_partitions(
                d, v0, current_version(d), binds, **kw
            )
            plan_wall = time.time() - t0
            kinds = sorted({p["kind"] for p in parts})

            t0 = time.time()
            reader = (
                spark.read.format("txlog_changes")
                .option("path", d)
                .option("fromVersion", v0)
            )
            if not tracked:
                reader = reader.option("maxDiffRows", n_rows * 4)
            n_changes = reader.load().count()
            feed_wall = time.time() - t0

            expected = (n_rows // 2 + (n_rows % 2)) * 2
            assert n_changes == expected, (label, n_changes, expected)
            out[label] = {
                "partitions": len(parts),
                "kinds": kinds,
                "commit_wall_s": round(commit_wall, 2),
                "plan_wall_s": round(plan_wall, 2),
                "feed_wall_s": round(feed_wall, 2),
                "change_rows": n_changes,
            }
        out["feed_speedup"] = round(
            out["untracked"]["feed_wall_s"] / out["rid"]["feed_wall_s"], 2
        )
        print(json.dumps(out))
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
