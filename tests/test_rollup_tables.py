"""Sketch rollup tables: slice answers from merged sketches must match
(exactly, or within the sketch's proven bounds) the same computation run
directly on the raw slice — and the date filter must partition-prune."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from etl_sentinel_imagery_spark.operators.sketches import exact_error_bound
from etl_sentinel_imagery_spark.plans.rollup_tables import (
    VALUE_EDGES,
    build_rollup_table,
    read_slice,
    slice_summary,
)
from etl_sentinel_imagery_spark.sources.tables import load_table
from tests.conftest import SF_DIR


def test_rollup_slice_answers_match_raw(spark, tmp_path):
    events = load_table(spark, SF_DIR, "events").withColumn(
        "day", F.to_date("ts")
    )
    table = str(tmp_path / "rollup")
    build_rollup_table(events, table)

    days = sorted(r["day"] for r in events.select("day").distinct().collect())
    lo, hi = days[0], days[len(days) // 2]
    raw = events.filter((F.col("day") >= lo) & (F.col("day") <= hi))

    row = slice_summary(spark, table, lo, hi).collect()[0]

    # exact pieces: event count and histogram
    assert row["n_events"] == raw.count()
    exact_hist = [
        raw.filter(F.col("value") < VALUE_EDGES[0]).count(),
        raw.filter(
            (F.col("value") >= VALUE_EDGES[0]) & (F.col("value") < VALUE_EDGES[1])
        ).count(),
        raw.filter(
            (F.col("value") >= VALUE_EDGES[1]) & (F.col("value") < VALUE_EDGES[2])
        ).count(),
        raw.filter(F.col("value") >= VALUE_EDGES[2]).count(),
    ]
    assert list(row["value_hist"]) == exact_hist

    # sketch pieces: HLL within bound, top-k within merge bounds
    exact_users = raw.select("user_id").distinct().count()
    assert (
        abs(row["est_distinct_users"] - exact_users) / exact_users
        < exact_error_bound(exact_users)
    )
    true_counts = {
        str(r["user_id"]): r["cnt"]
        for r in raw.groupBy("user_id").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    items, off = dict(row["top_items"]), row["top_off"]
    assert items
    for item, est in items.items():
        assert true_counts[item] <= est <= true_counts[item] + off
    for item, cnt in true_counts.items():
        if item not in items:
            assert cnt <= off


def test_rollup_typed_slice_and_partition_pruning(spark, tmp_path):
    events = load_table(spark, SF_DIR, "events").withColumn(
        "day", F.to_date("ts")
    )
    table = str(tmp_path / "rollup")
    build_rollup_table(events, table)

    days = sorted(r["day"] for r in events.select("day").distinct().collect())
    lo = hi = days[0]

    # typed slice: exact count equality against raw
    raw = events.filter((F.col("day") == lo) & (F.col("event_type") == "click"))
    row = slice_summary(spark, table, lo, hi, event_type="click").collect()[0]
    assert row["n_events"] == raw.count()

    # the day filter must reach the scan as a PartitionFilter
    buf = io.StringIO()
    with redirect_stdout(buf):
        read_slice(spark, table, lo, hi).explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan and "day" in plan


def test_all_null_value_cell_survives_with_zero_histogram(spark, tmp_path):
    """A (day, event_type) cell whose value column is all NULL must keep
    its exact count / HLL / top-k in the rollup (histogram LEFT-joins in
    and coalesces to the all-zero array) — an inner join would silently
    drop the whole cell and every slice containing it would undercount."""
    events = load_table(spark, SF_DIR, "events")
    planted = events.limit(7).withColumn(
        "ts", F.lit("2031-01-01 00:00:00").cast("timestamp")
    ).withColumn("event_type", F.lit("nullval")).withColumn(
        "value", F.lit(None).cast("double")
    )
    table = str(tmp_path / "rollup")
    build_rollup_table(events.unionByName(planted), table)

    import datetime

    d = datetime.date(2031, 1, 1)
    row = slice_summary(spark, table, d, d, event_type="nullval").collect()[0]
    assert row["n_events"] == 7
    assert list(row["value_hist"]) == [0] * (len(VALUE_EDGES) + 1)
    assert row["est_distinct_users"] > 0
    assert row["top_items"]


def test_slice_quantiles_from_kll_within_bound(spark, tmp_path):
    """slice_summary's KLL quantiles must sit within the rank bound of
    the raw slice's exact quantiles — the any-slice percentile answer
    without rescanning raw data."""
    import numpy as np

    events = load_table(spark, SF_DIR, "events").withColumn(
        "day", F.to_date("ts")
    )
    table = str(tmp_path / "rollup")
    build_rollup_table(events, table)
    days = sorted(r["day"] for r in events.select("day").distinct().collect())
    lo, hi = days[0], days[len(days) // 2]
    row = slice_summary(spark, table, lo, hi).collect()[0]

    raw = events.filter(
        (F.col("day") >= lo) & (F.col("day") <= hi)
        & F.col("value").isNotNull()
    ).select(F.col("value").cast("double").alias("v")).collect()
    s = np.sort(np.array([r["v"] for r in raw]))
    for q, est in ((0.5, row["value_p50"]), (0.9, row["value_p90"]),
                   (0.99, row["value_p99"])):
        rank = np.searchsorted(s, est, side="right") / len(s)
        assert abs(rank - q) <= 0.02, (q, est, rank)
