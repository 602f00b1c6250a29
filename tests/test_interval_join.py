"""Bucketized interval join == the naive theta-join, without its plan."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F
from pyspark.sql.utils import PythonException

from etl_sentinel_imagery_spark.operators.asof import interval_join


def _truth(points, intervals, key=None):
    out = []
    for p in points:
        for iv in intervals:
            if key is not None and p[0] != iv[0]:
                continue
            ts = p[-1]
            lo, hi = iv[-2], iv[-1]
            if lo <= ts <= hi:
                out.append((p, iv))
    return out


def test_matches_naive_theta_join_randomized(spark):
    rng = random.Random(42)
    points = [(i, rng.randint(0, 1000)) for i in range(300)]
    intervals = [
        (j, lo := rng.randint(0, 950), lo + rng.randint(0, 120))
        for j in range(60)
    ]
    p_df = spark.createDataFrame(points, "pid bigint, ts bigint")
    iv_df = spark.createDataFrame(
        intervals, "ivid bigint, lo bigint, hi bigint"
    )
    got = {
        (r["pid"], r["iv_ivid"])
        for r in interval_join(p_df, iv_df, "ts", "lo", "hi", 50).collect()
    }
    want = {(p[0], iv[0]) for p, iv in _truth(points, intervals)}
    assert got == want and len(want) > 100


def test_boundaries_inclusive_and_multibin(spark):
    p_df = spark.createDataFrame(
        [(1, 10), (2, 25), (3, 99), (4, 100), (5, 9)],
        "pid bigint, ts bigint",
    )
    # one interval spanning many 10-wide bins, zero-length interval
    iv_df = spark.createDataFrame(
        [(7, 10, 99), (8, 25, 25)], "ivid bigint, lo bigint, hi bigint"
    )
    got = sorted(
        (r["pid"], r["iv_ivid"])
        for r in interval_join(p_df, iv_df, "ts", "lo", "hi", 10).collect()
    )
    assert got == [(1, 7), (2, 7), (2, 8), (3, 7)]


def test_keyed_and_left_join(spark):
    p_df = spark.createDataFrame(
        [("a", 1, 50), ("b", 2, 50), ("a", 3, 500)],
        "k string, pid bigint, ts bigint",
    )
    iv_df = spark.createDataFrame(
        [("a", 9, 0, 100)], "k string, ivid bigint, lo bigint, hi bigint"
    )
    inner = interval_join(
        p_df, iv_df, "ts", "lo", "hi", 60, key="k"
    ).collect()
    assert [(r["pid"], r["iv_ivid"]) for r in inner] == [(1, 9)]
    left = interval_join(
        p_df, iv_df, "ts", "lo", "hi", 60, key="k", how="left"
    ).collect()
    assert len(left) == 3
    by_pid = {r["pid"]: r["iv_ivid"] for r in left}
    assert by_pid == {1: 9, 2: None, 3: None}


def test_negative_timestamps_align(spark):
    p_df = spark.createDataFrame([(1, -15)], "pid bigint, ts bigint")
    iv_df = spark.createDataFrame(
        [(5, -20, -10)], "ivid bigint, lo bigint, hi bigint"
    )
    got = interval_join(p_df, iv_df, "ts", "lo", "hi", 8).collect()
    assert [(r["pid"], r["iv_ivid"]) for r in got] == [(1, 5)]


def test_mega_interval_guard_raises(spark):
    p_df = spark.createDataFrame([(1, 5)], "pid bigint, ts bigint")
    iv_df = spark.createDataFrame(
        [(5, 0, 10_000_000)], "ivid bigint, lo bigint, hi bigint"
    )
    with pytest.raises(Exception, match="widen bin_width"):
        interval_join(
            p_df, iv_df, "ts", "lo", "hi", 1, max_bins_per_interval=1000
        ).collect()
