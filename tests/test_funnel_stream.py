"""Streaming funnel: cross-micro-batch state equals the batch DP on
time-ordered feeds; stale stragglers cannot corrupt state."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from etl_sentinel_imagery_spark.operators.funnel import funnel_progress
from etl_sentinel_imagery_spark.sources.tables import load_table
from etl_sentinel_imagery_spark.streaming.funnel_stream import (
    funnel_progress_stream,
)
from tests.conftest import SF_DIR

STEPS = ["view", "click", "purchase"]
SCHEMA = "user_id bigint, secs bigint, event_type string"


def _drive(spark, tmp_path, batches, window=None):
    """Feed batches of (user, secs, type) rows through the stream one
    micro-batch at a time; return the final per-entity state."""
    src = str(tmp_path / "events")
    q = None
    try:
        for i, rows in enumerate(batches):
            df = spark.createDataFrame(rows, SCHEMA).withColumn(
                "ts", F.timestamp_seconds("secs")
            )
            df.coalesce(1).write.mode("append").parquet(src)
            if q is None:
                stream = (
                    spark.readStream.schema(
                        spark.read.parquet(src).schema
                    ).parquet(src)
                )
                q = (
                    funnel_progress_stream(stream, STEPS, window_seconds=window)
                    .writeStream.format("memory")
                    .queryName("funnel_state")
                    .outputMode("update")
                    .option(
                        "checkpointLocation", str(tmp_path / "ckpt")
                    )
                    .start()
                )
            q.processAllAvailable()
        # update mode appends one row per (entity, batch-with-events);
        # levels are elementwise monotone, so the FINAL state is the
        # lexicographic max per entity regardless of sink row order
        out: dict = {}
        for r in spark.sql("SELECT * FROM funnel_state").collect():
            cand = (r["steps_completed"], list(r["level_ts"]))
            if r["entity"] not in out or cand > out[r["entity"]]:
                out[r["entity"]] = cand
        return out
    finally:
        if q is not None:
            q.stop()


def test_state_persists_across_micro_batches(spark, tmp_path):
    """view lands in batch 1, click+purchase in batch 2 — completion
    requires the level state to survive the batch boundary."""
    got = _drive(
        spark,
        tmp_path,
        [
            [(1, 100, "view")],
            [(1, 200, "click"), (1, 300, "purchase")],
        ],
    )
    assert got[1] == (3, [100, 200, 300])


def test_ordered_feed_matches_batch_funnel(spark, tmp_path):
    """Real events split into time-ordered micro-batches: final stream
    state == the batch DP over the whole table (the semantic oracle)."""
    events = (
        load_table(spark, SF_DIR, "events")
        .select(
            "user_id",
            F.unix_timestamp("ts").alias("secs"),
            "event_type",
        )
        .orderBy("secs", "user_id")
        .collect()
    )
    rows = [(r["user_id"], r["secs"], r["event_type"]) for r in events]
    third = len(rows) // 3
    batches = [rows[:third], rows[third : 2 * third], rows[2 * third :]]
    got = _drive(spark, tmp_path, batches, window=6 * 3600)

    want = {
        r["entity"]: (r["steps_completed"], list(r["level_ts"]))
        for r in funnel_progress(
            load_table(spark, SF_DIR, "events"),
            STEPS,
            window_seconds=6 * 3600,
        ).collect()
    }
    assert got == want


def test_stale_straggler_cannot_corrupt_levels(spark, tmp_path):
    """A click arriving in batch 2 with a timestamp BEFORE the stored
    view level still advances (t >= prev holds), but a click older than
    the stored view must not: levels only move forward."""
    got = _drive(
        spark,
        tmp_path,
        [
            [(1, 100, "view"), (2, 100, "view")],
            # user 1: click AFTER its view → advances
            # user 2: click BEFORE its view (stale straggler) → ignored
            [(1, 150, "click"), (2, 50, "click")],
        ],
    )
    assert got[1] == (2, [100, 150, -1])
    assert got[2] == (1, [100, -1, -1])


def test_ordered_mode_recovers_out_of_order_completion(spark, tmp_path):
    """click(t=150) ARRIVES before view(t=100): arrival-order mode can't
    complete the funnel; watermark-ordered mode buffers both, drains
    them in event-time order once the watermark passes, and completes."""
    src = str(tmp_path / "events")

    def feed(rows):
        spark.createDataFrame(rows, SCHEMA).withColumn(
            "ts", F.timestamp_seconds("secs")
        ).coalesce(1).write.mode("append").parquet(src)

    feed([(1, 150, "click")])
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .parquet(src)
        .withWatermark("ts", "10 seconds")
    )
    q = (
        funnel_progress_stream(
            stream, ["view", "click"], ordered=True
        )
        .writeStream.format("memory")
        .queryName("funnel_ordered")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        feed([(1, 100, "view")])  # out of order, within nothing drained yet
        q.processAllAvailable()
        # two flush batches: the first raises the max event time, the
        # second runs with the advanced watermark and drains the buffer
        feed([(1, 10_000, "noise")])
        q.processAllAvailable()
        feed([(1, 20_000, "noise")])
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM funnel_ordered").collect()
        best = max(
            (r["steps_completed"], list(r["level_ts"])) for r in rows
        )
        assert best == (2, [100, 150])
    finally:
        q.stop()
