"""Measure the table's two read surfaces so the docs can steer bulk
consumers honestly (round-6 verdict #8):

- ``snapshot()`` — the JVM-NATIVE path: a parquet relation planned by
  Catalyst (column pruning, predicate pushdown, whole-stage codegen;
  DV masks as anti-joins). The engine's hot read path.
- ``txlog_table`` — the Python DataSource interop/SQL surface: the
  same committed view, but every batch crosses the Arrow boundary
  through a Python worker per partition. Pay that only for what it
  buys (``CREATE TEMPORARY VIEW ... USING txlog_table``, time-travel
  options in SQL, feeding tools that only speak relations).

Prints one JSON line with medians over ``iters`` of a full-scan
aggregate and a column-pruned aggregate on an ``n_rows`` table.

Usage: python tools/bench_read_paths.py [n_rows] [n_files] [iters]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import tempfile
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    from pyspark.sql import SparkSession, functions as F

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from etl_sentinel_imagery_spark.operators.txlog import (
        init_table,
        snapshot,
    )
    from etl_sentinel_imagery_spark.sources.txlog_stream import register

    register(spark)
    t = os.path.join(tempfile.mkdtemp(prefix="bench_read_"), "t")
    df = (
        spark.range(n)
        .select(
            F.col("id").alias("k"),
            (F.col("id") % 997).alias("g"),
            (F.col("id") * 31 % 1009).cast("double").alias("x"),
            F.sha1(F.col("id").cast("string")).alias("payload"),
        )
        .repartition(n_files)
    )
    init_table(spark, t, df)

    def run(mk):
        walls = []
        for _ in range(iters):
            t0 = time.time()
            mk().collect()
            walls.append(time.time() - t0)
        return round(statistics.median(walls), 3)

    native = snapshot(spark, t)
    interop = spark.read.format("txlog_table").option("path", t).load()
    out = {
        "n_rows": n,
        "n_files": n_files,
        "iters": iters,
        "full_agg_snapshot_s": run(
            lambda: native.groupBy("g").agg(
                F.sum("x"), F.count("payload")
            )
        ),
        "full_agg_txlog_table_s": run(
            lambda: interop.groupBy("g").agg(
                F.sum("x"), F.count("payload")
            )
        ),
        "pruned_agg_snapshot_s": run(
            lambda: snapshot(spark, t).agg(F.sum("x"))
        ),
        "pruned_agg_txlog_table_s": run(
            lambda: spark.read.format("txlog_table")
            .option("path", t)
            .load()
            .agg(F.sum("x"))
        ),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
