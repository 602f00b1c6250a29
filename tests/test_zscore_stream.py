"""Streaming rolling z-score: finalized buckets across micro-batches
equal the batch rolling_zscore∘resample_counts rows bit-for-bit; late
events within the watermark delay land in their true bucket."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_sentinel_imagery_spark.operators.timeseries import (
    resample_counts,
    rolling_zscore,
)
from etl_sentinel_imagery_spark.sources.tables import load_table
from etl_sentinel_imagery_spark.streaming.zscore_stream import (
    rolling_zscore_stream,
)
from tests.conftest import SF_DIR

SCHEMA = "event_type string, secs bigint"
FLUSH_SECS = 4_000_000_000  # far future; identical in both flush batches


def _drive(spark, tmp_path, batches, step_seconds, delay="1 second"):
    """Feed (event_type, secs) batches through the stream one
    micro-batch at a time; two identical-timestamp flush batches at the
    end advance the watermark and fire the event-time drain timeouts.
    Returns {(key, bucket): (n, mean, z)} over emitted rows."""
    src = str(tmp_path / "events")
    q = None
    try:
        for rows in list(batches) + [
            [("__flush__", FLUSH_SECS)],
            [("__flush__", FLUSH_SECS)],
        ]:
            df = spark.createDataFrame(rows, SCHEMA).withColumn(
                "ts", F.timestamp_seconds("secs")
            )
            df.coalesce(1).write.mode("append").parquet(src)
            if q is None:
                stream = (
                    spark.readStream.schema(spark.read.parquet(src).schema)
                    .parquet(src)
                    .withWatermark("ts", delay)
                )
                q = (
                    rolling_zscore_stream(
                        stream, step_seconds=step_seconds
                    )
                    .writeStream.format("memory")
                    .queryName("z_rows")
                    .outputMode("append")
                    .option("checkpointLocation", str(tmp_path / "ckpt"))
                    .start()
                )
            q.processAllAvailable()
        out = {}
        for r in spark.sql("SELECT * FROM z_rows").collect():
            if r["event_type"] == "__flush__":
                continue
            cell = (r["event_type"], r["bucket"])
            # append mode: each finalized bucket must appear exactly once
            assert cell not in out, f"duplicate emission for {cell}"
            out[cell] = (r["n_events"], r["roll_mean"], r["roll_z"])
        return out
    finally:
        if q is not None:
            q.stop()


def _batch_oracle(spark, rows, step_seconds):
    df = spark.createDataFrame(rows, SCHEMA).withColumn(
        "ts", F.timestamp_seconds("secs")
    )
    z = rolling_zscore(
        resample_counts(df, "ts", f"{step_seconds} seconds", ["event_type"]),
        ["event_type"],
        "bucket",
        "n_events",
        n_buckets=4,
    )
    return {
        (r["event_type"], r["b_secs"]): (
            r["n_events"],
            r["roll_mean"],
            r["roll_z"],
        )
        for r in z.withColumn(
            "b_secs", F.unix_timestamp("bucket")
        ).collect()
    }


def test_gap_filled_axis_and_exact_stats(spark, tmp_path):
    """Sparse key: gap buckets emit as zeros and every statistic equals
    the batch operator exactly (same IEEE op order, same ints)."""
    rows = [
        ("a", 60),
        ("a", 70),
        ("a", 90),
        ("b", 125),
        ("a", 130),
        ("b", 160),
        ("a", 460),  # leaves buckets 180..420 as gap zeros for key a
        ("a", 490),
    ]
    # batch split is GLOBALLY time-ordered (the watermark is global, not
    # per key): Spark drops stateful-operator input rows at or below the
    # watermark (max seen − delay), the standard late-data discard — an
    # ordered feed with 1 s delay never trips it
    got = _drive(spark, tmp_path, [rows[:4], rows[4:]], step_seconds=60)
    want = _batch_oracle(spark, rows, step_seconds=60)
    assert got == want


def test_state_survives_batch_boundaries_on_real_events(spark, tmp_path):
    """Real events table split into 3 time-ordered micro-batches: the
    emitted rows equal the batch signal over the whole table."""
    events = (
        load_table(spark, SF_DIR, "events")
        .where(F.col("user_id") % 20 == 0)
        .select("event_type", F.unix_timestamp("ts").alias("secs"))
        .orderBy("secs", "event_type")
        .collect()
    )
    rows = [(r["event_type"], r["secs"]) for r in events]
    third = len(rows) // 3
    batches = [rows[:third], rows[third : 2 * third], rows[2 * third :]]
    got = _drive(spark, tmp_path, batches, step_seconds=21600)
    want = _batch_oracle(spark, rows, step_seconds=21600)
    assert got == want


def test_late_event_within_watermark_lands_in_its_bucket(spark, tmp_path):
    """An out-of-order event older than the stream's max-seen time but
    inside the watermark delay must still count toward its (not yet
    finalized) bucket — pending counts accumulate until finality."""
    b1 = [("x", 60), ("x", 90)]
    b2 = [("x", 560)]  # wm after this batch = 560 - 120 = 440
    late = [("x", 460)]  # bucket 420 not finalized (480 > 440) → counts
    b4 = [("x", 760)]
    all_rows = b1 + b2 + late + b4
    got = _drive(
        spark,
        tmp_path,
        [b1, b2, late, b4],
        step_seconds=60,
        delay="120 seconds",
    )
    want = _batch_oracle(spark, all_rows, step_seconds=60)
    assert got == want
    assert got[("x", 420)][0] == 1  # the late event is in its bucket
