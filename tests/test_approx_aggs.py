"""Approximate aggregates: accuracy vs exact (no SQL oracle — sketches
are engine-specific by design; the contract is bounded error)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_sentinel_imagery_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_approx_count_distinct_within_rsd(spark):
    orders = load_table(spark, SF_DIR, "orders")
    exact = orders.select(F.countDistinct("o_custkey")).collect()[0][0]
    approx = orders.select(
        F.approx_count_distinct("o_custkey", rsd=0.02)
    ).collect()[0][0]
    assert abs(approx - exact) / exact < 0.06  # 3×rsd headroom


def test_percentile_approx_brackets_exact(spark):
    li = load_table(spark, SF_DIR, "lineitem")
    row = li.select(
        F.expr("percentile(l_extendedprice, 0.5)").alias("exact"),
        F.expr("percentile_approx(l_extendedprice, 0.5, 10000)").alias("approx"),
    ).collect()[0]
    # high-accuracy sketch: within 1% of the exact median
    assert abs(row["approx"] - row["exact"]) / row["exact"] < 0.01


def test_approx_quantiles_monotone(spark):
    li = load_table(spark, SF_DIR, "lineitem")
    qs = li.approxQuantile("l_extendedprice", [0.1, 0.5, 0.9], 0.01)
    assert qs == sorted(qs)
    lo, hi = (
        li.agg(F.min("l_extendedprice"), F.max("l_extendedprice")).collect()[0]
    )
    assert lo <= qs[0] <= qs[2] <= hi
