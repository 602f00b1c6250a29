"""Attribution for the DML battery's final_aggregates residual:
replays the battery's statement sequence (same code path via
_txlog_dml_battery), then times each of the five post-state aggregates
separately by re-deriving them against the battery's own tables.

To reach the battery's internal temp dirs it wraps tempfile.mkdtemp.
Pure measurement — no behavior change.

Usage: python tools/profile_dml_aggs.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from etl_sentinel_imagery_spark.session import get_spark

DIRS: list[str] = []
_orig_mkdtemp = tempfile.mkdtemp


def _spy_mkdtemp(*a, **k):
    d = _orig_mkdtemp(*a, **k)
    if k.get("prefix", a[2] if len(a) > 2 else "").startswith("txdml_"):
        DIRS.append(d)
    return d


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("profile-dml-aggs", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    tempfile.mkdtemp = _spy_mkdtemp

    from etl_sentinel_imagery_spark.operators.txlog import (
        snapshot,
        table_changes,
    )
    from etl_sentinel_imagery_spark.queries.dml_q import _txlog_dml_battery

    legs: dict[str, float] = {}
    t0 = time.time()
    _txlog_dml_battery(spark, sf_dir, leg_timings=legs).count()
    total = time.time() - t0
    print(f"battery total {total:.3f}s  (statements {sum(legs.values()):.3f})")

    d_cust = os.path.join(DIRS[0], "cust")
    d_li = os.path.join(DIRS[1], "li")
    d_nat = os.path.join(DIRS[2], "nat")
    d_cp = os.path.join(DIRS[3], "cp")

    def t(name, df):
        t0 = time.time()
        df.count()
        dt = time.time() - t0
        print(f"  agg {name:12s} {dt:8.3f}s")

    for rep in range(2):
        print(f"rep {rep}:")
        t("cust_snap", snapshot(spark, d_cust).groupBy("c_nationkey").agg(
            F.count(F.lit(1)).alias("n"), F.sum("bal").alias("s")))
        tf0 = time.time()
        feed = table_changes(spark, d_cust, 0)
        print(f"  feed plan-build {time.time()-tf0:.3f}s")
        t("feed", feed.groupBy("_change_type").agg(
            F.count(F.lit(1)).alias("n"), F.sum("bal").alias("s")))
        t("li_snap", snapshot(spark, d_li).groupBy("l_linenumber").agg(
            F.count(F.lit(1)).alias("n"), F.sum("price").alias("s")))
        t("nat_snap", snapshot(spark, d_nat).groupBy("n_regionkey").agg(
            F.count(F.lit(1)).alias("n")))
        t("cp_snap", snapshot(spark, d_cp).groupBy("rk").agg(
            F.count(F.lit(1)).alias("n")))


if __name__ == "__main__":
    main()
