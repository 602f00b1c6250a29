"""Scale-path stress: WHEN NOT MATCHED BY SOURCE at 1M rows.

The by-source leg is a FULL-TABLE operation by definition (any file
may hold rows whose key is absent from the source — probe pruning
cannot apply; Delta pays the same shape). This run pins its cost
profile against the matched-only merge on the same table:

- matched-only merge (1k narrow keys): probe-pruned, touches a few
  files — the baseline;
- the same merge + a by-source clause touching 0.1% of rows
  (k % 1000 = 0): ONE distributed anti-join scan over the table plus
  DV hits in every file holding a selected row — wall grows by a
  table-scan, not by a per-file loop;
- post-state verified exactly (selected non-source rows negated,
  matched rows updated, everything else untouched).

Usage: python tools/stress_merge_bysource.py [n_rows] [n_files]
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
    init_table,
    merge,
    snapshot,
)
from etl_sentinel_imagery_spark.session import get_spark


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g")
    spark = get_spark(
        "stress_merge_bysource",
        extra_conf={"spark.driver.memory": mem},
    )
    work = tempfile.mkdtemp(prefix="merge_bysource_")
    out: dict = {"n_rows": n, "n_files": n_files}

    def seed():
        return spark.range(n).select(
            F.col("id").alias("k"),
            (F.col("id") * 3).alias("v"),
        )

    src = spark.range(1000).select(
        (F.col("id") + n // 2).alias("k"),  # narrow matched range
        F.lit(-7).alias("v"),
    )

    try:
        # baseline: matched-only, probe-pruned
        a = os.path.join(work, "a")
        init_table(
            spark, a, seed().repartition(n_files), stat_cols=["k"]
        )
        t0 = time.time()
        merge(
            spark, a, src, "k",
            when_matched=[("update", None, {"v": "s.v"})],
            when_not_matched=[],
        )
        out["matched_only_s"] = round(time.time() - t0, 2)

        # + by-source: same matched work, plus the full-table leg
        b = os.path.join(work, "b")
        init_table(
            spark, b, seed().repartition(n_files), stat_cols=["k"]
        )
        t0 = time.time()
        merge(
            spark, b, src, "k",
            when_matched=[("update", None, {"v": "s.v"})],
            when_not_matched=[],
            when_not_matched_by_source=[
                ("update", "t.k % 1000 = 0", {"v": "-t.v"}),
            ],
        )
        out["with_bysource_s"] = round(time.time() - t0, 2)

        snap = snapshot(spark, b)
        got = snap.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum((F.col("v") == -7).cast("long")).alias("matched"),
            F.sum((F.col("v") < 0).cast("long")).alias("neg"),
        ).collect()[0]
        # selected by-source rows: k % 1000 == 0 and k not in source
        sel = n // 1000  # ids 0, 1000, ... (none in the src range
        # unless n//2 hits a multiple of 1000 inside [n//2, n//2+1000))
        overlap = sum(
            1
            for k in range(n // 2, n // 2 + 1000)
            if k % 1000 == 0
        )
        out["rows_exact"] = bool(
            got["n"] == n
            and got["matched"] == 1000
            # negated: by-source selected rows minus the overlap that
            # matched instead, minus k=0 (v=0 is not < 0)
            and got["neg"] == 1000 + (sel - overlap) - 1
        )
        out["counts"] = {
            "matched": got["matched"],
            "neg": got["neg"],
            "expected_neg": 1000 + (sel - overlap) - 1,
        }
        print(json.dumps(out))
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
