"""Funnel operator: per-level DP vs an independent Python reference on
the real events table, the greedy-killer window case, repeated-step
chains, and funnel-chart monotonicity."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_sentinel_imagery_spark.operators.funnel import (
    funnel_counts,
    funnel_progress,
)
from etl_sentinel_imagery_spark.sources.tables import load_table
from tests.conftest import SF_DIR

STEPS = ["view", "click", "purchase"]


def _reference_dp(evts, steps, window):
    """Independent per-level DP: latest chain end-time per level."""
    lv = [-1] * len(steps)
    for t, e in sorted(evts):
        new = list(lv)
        for j, s in enumerate(steps):
            if e != s:
                continue
            if j == 0:
                new[j] = max(new[j], t)
            elif lv[j - 1] >= 0 and t >= lv[j - 1] and (
                window is None or t - lv[j - 1] <= window
            ):
                new[j] = max(new[j], t)
        lv = new
    return lv


def test_funnel_matches_python_reference_on_events(spark):
    events = load_table(spark, SF_DIR, "events")
    for window in (None, 6 * 3600):
        got = {
            r["entity"]: (r["steps_completed"], list(r["level_ts"]))
            for r in funnel_progress(
                events, STEPS, window_seconds=window
            ).collect()
        }
        raw: dict = {}
        for r in events.select(
            "user_id", F.unix_timestamp("ts").alias("t"), "event_type"
        ).collect():
            raw.setdefault(r["user_id"], []).append((r["t"], r["event_type"]))
        for user, evts in raw.items():
            lv = _reference_dp(evts, STEPS, window)
            done = sum(1 for x in lv if x >= 0)
            assert got[user] == (done, lv), f"user {user} window {window}"


def test_window_dp_beats_greedy_anchor(spark):
    """A(0), A(95), B(100), window 10: the earliest-anchor greedy fails;
    the DP completes via the later anchor."""
    df = spark.createDataFrame(
        [(1, 0, "A"), (1, 95, "A"), (1, 100, "B")],
        "user_id long, secs long, event_type string",
    ).withColumn("ts", F.timestamp_seconds("secs"))
    row = funnel_progress(df, ["A", "B"], window_seconds=10).collect()[0]
    assert row["steps_completed"] == 2
    assert list(row["level_ts"]) == [95, 100]


def test_repeated_step_types_never_double_count_one_event(spark):
    """steps [A, A]: a single A cannot serve both levels; two As do."""
    one = spark.createDataFrame(
        [(1, 10, "A")], "user_id long, secs long, event_type string"
    ).withColumn("ts", F.timestamp_seconds("secs"))
    assert (
        funnel_progress(one, ["A", "A"]).collect()[0]["steps_completed"] == 1
    )
    two = spark.createDataFrame(
        [(1, 10, "A"), (1, 20, "A")],
        "user_id long, secs long, event_type string",
    ).withColumn("ts", F.timestamp_seconds("secs"))
    assert (
        funnel_progress(two, ["A", "A"]).collect()[0]["steps_completed"] == 2
    )


def test_funnel_counts_monotone(spark):
    events = load_table(spark, SF_DIR, "events")
    rows = funnel_counts(events, STEPS, window_seconds=24 * 3600).collect()
    assert [r["step"] for r in rows] == sorted(r["step"] for r in rows)
    counts = [r["n_entities"] for r in rows]
    assert all(a >= b for a, b in zip(counts, counts[1:]))
    assert rows[0]["step_name"] == "view"
