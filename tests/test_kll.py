"""KLL quantile sketch: rank-error bounds vs exact quantiles, exact
merge composition (the rollup property), determinism (the replay
contract), and the two-phase Spark build."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from etl_sentinel_imagery_spark.operators.kll import (
    KllSketch,
    kll_merge_rows,
    kll_quantiles,
    kll_sketch,
)
from etl_sentinel_imagery_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.01"
EPS = 0.015  # measured headroom for the deterministic variant at k=200


def _rank_of(sorted_vals: np.ndarray, v: float) -> float:
    return np.searchsorted(sorted_vals, v, side="right") / len(sorted_vals)


def test_rank_error_bound_single_sketch():
    rng = np.random.default_rng(3)
    data = rng.lognormal(0.0, 1.5, size=20_000)
    sk = KllSketch(200)
    for v in data:
        sk.update(float(v))
    assert sk.n == len(data)
    s = np.sort(data)
    for q in (0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99):
        est = sk.quantile(q)
        assert abs(_rank_of(s, est) - q) <= EPS, (q, est)
    # space actually sublinear: far fewer retained items than inputs
    retained = sum(len(lv) for lv in sk.levels)
    assert retained < 2_500


def test_merge_of_shards_keeps_bound_and_exact_n():
    rng = np.random.default_rng(11)
    data = rng.normal(50.0, 20.0, size=30_000)
    shards = np.array_split(data, 13)
    sketches = []
    for sh in shards:
        sk = KllSketch(200)
        for v in sh:
            sk.update(float(v))
        sketches.append(sk)
    acc = sketches[0]
    for sk in sketches[1:]:
        acc = acc.merge(sk)
    assert acc.n == len(data)  # counts are exact through merge
    s = np.sort(data)
    for q in (0.05, 0.5, 0.95, 0.99):
        assert abs(_rank_of(s, acc.quantile(q)) - q) <= EPS


def test_deterministic_rebuild_bit_identical():
    rng = np.random.default_rng(5)
    data = [float(v) for v in rng.uniform(0, 1, size=5_000)]
    a, b = KllSketch(100), KllSketch(100)
    for v in data:
        a.update(v)
        b.update(v)
    assert a.to_row() == b.to_row()  # replay-safe: same input, same bytes


def test_spark_two_phase_build_matches_driver_sketch_bounds(spark):
    events = load_table(spark, SF_DIR, "events")
    sk_df = kll_sketch(events, ["event_type"], "value")
    rows = {r["event_type"]: r["kll"] for r in sk_df.collect()}
    vals = events.filter(F.col("value").isNotNull()).select(
        "event_type", F.col("value").cast("double").alias("v")
    ).collect()
    by_type: dict = {}
    for r in vals:
        by_type.setdefault(r["event_type"], []).append(r["v"])
    assert set(rows) == set(by_type)
    for et, raw in by_type.items():
        s = np.sort(np.array(raw))
        sk_row = rows[et]
        assert sk_row["n"] == len(raw)  # NULLs excluded, count exact
        for q, est in zip((0.1, 0.5, 0.9), kll_quantiles(sk_row, [0.1, 0.5, 0.9])):
            assert abs(_rank_of(s, est) - q) <= max(EPS, 3.0 / len(raw))


def test_rollup_slice_pattern_any_slice_from_daily_sketches(spark):
    """The serving pattern: daily sketches persist; a date-range slice
    merges its rows and answers quantiles within the bound computed on
    the raw slice — without rescanning raw data."""
    events = load_table(spark, SF_DIR, "events").withColumn(
        "day", F.to_date("ts")
    )
    daily = kll_sketch(events, ["day"], "value")
    rows = sorted(daily.collect(), key=lambda r: r["day"])
    cut = len(rows) // 2
    slice_days = {r["day"] for r in rows[:cut]}
    merged = kll_merge_rows([r["kll"] for r in rows[:cut]])

    raw = events.filter(
        F.col("value").isNotNull()
        & F.col("day").cast("string").isin([str(d) for d in slice_days])
    ).select(F.col("value").cast("double").alias("v")).collect()
    s = np.sort(np.array([r["v"] for r in raw]))
    assert merged.n == len(s)
    for q in (0.25, 0.5, 0.9):
        assert abs(_rank_of(s, merged.quantile(q)) - q) <= EPS
