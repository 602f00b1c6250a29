"""Scale-path stress: CONCURRENT COPY INTO exactly-once (round 11).

N threads race copy_into over ONE landing dir of F files (plus a
mid-race late drop), against the same table. Whatever interleaving
the scheduler produces, the invariants are asserted, not eyeballed:

- every source row lands EXACTLY once (no double-load under any race);
- per-run `files_loaded` stats sum to one full load;
- the ledger covers every file and a replay no-ops.

This is the evidence run for the round-11 fix: the commit path
re-checks the copy ledger at every claim parent (first attempt AND
rebase) and losers restart against the fresh ledger
(operators/txlog.py:_check_copy_ledger_clear). Pre-fix, two racing
copiers would both see files as unloaded and both commit.

Usage: python tools/stress_copy_concurrent.py [n_files] [n_threads]
"""

from __future__ import annotations

import os
import sys
import tempfile
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from etl_sentinel_imagery_spark.operators.txlog import (
    copy_into,
    init_table,
    resolve_copy_ledger,
    snapshot,
)
from etl_sentinel_imagery_spark.session import get_spark


def _land(d: str, name: str, lo: int, n: int) -> None:
    ks = list(range(lo, lo + n))
    # write-then-rename: the landing contract is atomic PUBLISH — a
    # racer's glob must never observe a half-written parquet (it
    # would either fail the read or ledger a partial size and
    # re-ingest the completed file later)
    tmp = os.path.join(d, f"_tmp_{name}")
    pq.write_table(
        pa.table(
            {
                "k": pa.array(ks, pa.int64()),
                "v": pa.array([k * 3 for k in ks], pa.int64()),
            }
        ),
        tmp,
    )
    os.replace(tmp, os.path.join(d, name))


def main() -> None:
    n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    n_threads = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    rows_per_file = 10_000

    spark = get_spark("stress-copy-concurrent")
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="stress_copyc_")
    land = os.path.join(root, "landing")
    os.makedirs(land)
    for i in range(n_files):
        _land(land, f"f{i:04d}.parquet", i * rows_per_file, rows_per_file)
    tbl = os.path.join(root, "t")
    init_table(spark, tbl, spark.createDataFrame([], "k long, v long"))

    results: list[dict] = []
    errors: list[Exception] = []

    def run(tid: int) -> None:
        try:
            # each thread keeps copying until its pass is a no-op, so
            # the race covers both initial load and late pickup
            while True:
                _, stats = copy_into(spark, tbl, land)
                results.append(stats)
                if stats["files_loaded"] == 0:
                    return
        except Exception as exc:  # noqa: BLE001 — reported below
            errors.append(exc)

    t0 = time.time()
    threads = [
        threading.Thread(target=run, args=(i,)) for i in range(n_threads)
    ]
    for th in threads:
        th.start()
    # a late drop lands mid-race
    _land(land, "late.parquet", n_files * rows_per_file, rows_per_file)
    for th in threads:
        th.join()
    wall = time.time() - t0

    assert not errors, errors
    got = snapshot(spark, tbl)
    n = got.count()
    dups = got.groupBy("k").count().filter("count > 1").count()
    loaded = sum(s["files_loaded"] for s in results)
    led = len(resolve_copy_ledger(tbl))
    expect_files = n_files + 1
    assert dups == 0, f"{dups} duplicated keys — double-load!"
    assert n == expect_files * rows_per_file, (n, expect_files)
    assert loaded == expect_files, (loaded, expect_files)
    assert led == expect_files
    _, replay = copy_into(spark, tbl, land)
    assert replay["files_loaded"] == 0

    print(
        f"OK: {n_threads} threads × {expect_files} files "
        f"({n:,} rows) exactly-once in {wall:.1f}s; "
        f"{len(results)} copy passes, {loaded} loads total, "
        f"ledger={led}"
    )


if __name__ == "__main__":
    main()
