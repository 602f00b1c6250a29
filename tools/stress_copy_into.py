"""COPY INTO at scale: the ledger claim measured.

Scenario: a landing directory accumulating many small files over
repeated COPY INTO passes. The 100 TB contract has two halves:

  1. a pass's DATA cost tracks the NEW files, not the directory
     (the ledger subtraction is a driver dict op);
  2. the LEDGER overhead (resolve + embed at checkpoints) stays flat
     as the ledger grows into the thousands of entries.

Measured: wall per pass with a growing ledger and a constant new-file
batch; plus the no-op pass (everything already loaded) which must be
sub-second however large the ledger. Content verified by row count
and a key-sum signature after every pass.

Usage: python tools/stress_copy_into.py [files_per_pass] [passes]
       (default 200 x 5 = 1000 ledger entries)
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


def main(per_pass=200, passes=5):
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import SparkSession, functions as F

    from etl_sentinel_imagery_spark.operators.txlog import (
        copy_into,
        init_table,
        snapshot,
    )

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="stress_copy_")
    land = os.path.join(root, "landing")
    os.makedirs(land)
    t = os.path.join(root, "t")
    init_table(
        spark,
        t,
        spark.createDataFrame([], "k long, v long"),
    )

    n_rows_per_file = 50
    total = 0
    for p in range(passes):
        for i in range(per_pass):
            fid = p * per_pass + i
            ks = list(
                range(fid * n_rows_per_file, (fid + 1) * n_rows_per_file)
            )
            pq.write_table(
                pa.table(
                    {
                        "k": pa.array(ks, pa.int64()),
                        "v": pa.array([k * 3 for k in ks], pa.int64()),
                    }
                ),
                os.path.join(land, f"f{fid:06d}.parquet"),
            )
        t0 = time.time()
        v, stats = copy_into(spark, t, land)
        w = time.time() - t0
        total += per_pass * n_rows_per_file
        assert stats["files_loaded"] == per_pass, stats
        assert stats["files_skipped"] == p * per_pass, stats
        print(
            f"pass {p}: loaded {per_pass} new files "
            f"(ledger now {(p + 1) * per_pass}): {w:.2f}s"
        )
    t0 = time.time()
    _, stats = copy_into(spark, t, land)
    w_noop = time.time() - t0
    assert stats["files_loaded"] == 0
    print(
        f"no-op pass over a {passes * per_pass}-entry ledger: "
        f"{w_noop:.2f}s"
    )
    got = snapshot(spark, t).agg(
        F.count(F.lit(1)), F.sum("k")
    ).collect()[0]
    n_files = passes * per_pass
    n = n_files * n_rows_per_file
    assert int(got[0]) == n == total
    assert int(got[1]) == n * (n - 1) // 2
    print(f"content exact: {n} rows, key-sum verified")
    shutil.rmtree(root)


if __name__ == "__main__":
    a = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    b = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    main(a, b)
