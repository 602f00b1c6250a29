"""Scale-path stress: CONVERT TO TXLOG at 1M rows (round-10).

The adoption claim is "zero data IO — O(files) footer reads,
distributed": a directory's convert wall must track its FILE COUNT,
not its byte size. Measured here by converting the same 1M rows twice
— once narrow (3 columns) and once with a fat pad column (~25× the
bytes) — at the same file count: near-equal walls prove the pass
reads footers, not data. A third leg converts a hive-partitioned
layout (duplicate part-file basenames across leaves — the case that
forced exact full-name DV keying) and runs the DV delete + REORG
APPLY (PURGE) sequence on the adopted table, verifying row exactness
at 1M.

Usage: python tools/stress_convert.py [n_rows] [n_files]
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
    convert_to_txlog,
    resolve_files,
    snapshot,
    snapshot_pruned,
)
from etl_sentinel_imagery_spark.operators.txlog_sql import tx_sql
from etl_sentinel_imagery_spark.session import get_spark


def _dir_bytes(d):
    total = 0
    for root, _dirs, files in os.walk(d):
        for f in files:
            if f.endswith(".parquet"):
                total += os.path.getsize(os.path.join(root, f))
    return total


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    spark = get_spark(
        "stress_convert", master="local[32]", shuffle_partitions=32
    )
    base = tempfile.mkdtemp(prefix="stress_convert_")
    try:
        rows = spark.range(n_rows).select(
            F.col("id"),
            (F.col("id") % 97).alias("v"),
            (F.col("id") % 16).cast("int").alias("grp"),
        )

        # leg 1: narrow table, n_files files
        d1 = os.path.join(base, "narrow")
        rows.repartitionByRange(n_files, "id").write.parquet(d1)
        t0 = time.time()
        convert_to_txlog(spark, d1, stat_cols=["id"])
        w_narrow = time.time() - t0
        nf1 = len(resolve_files(d1))
        print(
            f"convert narrow: {w_narrow:.2f}s  files={nf1} "
            f"bytes={_dir_bytes(d1) / 1e6:.0f}MB"
        )
        assert snapshot(spark, d1).count() == n_rows
        _df, st = snapshot_pruned(
            spark, d1, "id", lo=0, hi=n_rows // n_files
        )
        print(
            f"  stats pruning after adopt: read {st['files_read']}/"
            f"{st['files_total']} files"
        )
        assert st["files_read"] <= 2, st

        # leg 2: same rows + fat pad column, same file count — the
        # wall must track FILES, not BYTES
        d2 = os.path.join(base, "fat")
        # incompressible pad (~256B/row of sha2 text) — a constant pad
        # would RLE away and prove nothing
        rows.withColumn(
            "pad",
            F.concat_ws(
                "",
                *[
                    F.sha2(
                        F.concat(
                            F.col("id").cast("string"), F.lit(str(i))
                        ),
                        256,
                    )
                    for i in range(4)
                ],
            ),
        ).repartitionByRange(n_files, "id").write.parquet(d2)
        t0 = time.time()
        convert_to_txlog(spark, d2, stat_cols=["id"])
        w_fat = time.time() - t0
        print(
            f"convert fat:    {w_fat:.2f}s  files="
            f"{len(resolve_files(d2))} "
            f"bytes={_dir_bytes(d2) / 1e6:.0f}MB"
        )
        assert snapshot(spark, d2).count() == n_rows

        # leg 3: hive layout with duplicate basenames, then the DV
        # delete + purge sequence on the adopted table
        d3 = os.path.join(base, "hive")
        rows.repartition(max(2, n_files // 16)).write.partitionBy(
            "grp"
        ).parquet(d3)
        t0 = time.time()
        convert_to_txlog(spark, d3)
        w_hive = time.time() - t0
        nf3 = len(resolve_files(d3))
        bases = [
            os.path.basename(
                e["name"] if isinstance(e, dict) else e
            )
            for e in resolve_files(d3)
        ]
        assert len(set(bases)) < len(bases), "no duplicate basenames?"
        print(f"convert hive:   {w_hive:.2f}s  files={nf3}")

        tables = {"t": d3}
        t0 = time.time()
        tx_sql(spark, "DELETE FROM t WHERE id % 10 = 0", tables)
        w_del = time.time() - t0
        t0 = time.time()
        _v, st = tx_sql(spark, "REORG TABLE t APPLY (PURGE)", tables)
        w_purge = time.time() - t0
        got = snapshot(spark, d3).count()
        want = n_rows - (n_rows + 9) // 10
        assert got == want, (got, want)
        print(
            f"dv delete: {w_del:.2f}s  purge: {w_purge:.2f}s "
            f"(rewrote {st['files_rewritten']} files)  rows exact: "
            f"{got}"
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
