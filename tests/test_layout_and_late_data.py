"""Physical-layout and late-data behavior proofs.

- Partition pruning: a dt-partitioned write is read back with a filter
  and the scan's PartitionFilters prove pruning (the 100 TB layout
  contract: time-partitioned facts scan only matching partitions).
- Watermark late data: a two-batch bounded stream where batch 2 carries
  events older than (max_seen − watermark) — the windowed aggregation
  must drop them instead of reopening closed windows.
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from etl_sentinel_imagery_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_partition_pruning(spark, tmp_path):
    out = str(tmp_path / "orders_by_year")
    orders = load_table(spark, SF_DIR, "orders").withColumn(
        "order_year", F.year("o_orderdate")
    )
    orders.write.partitionBy("order_year").parquet(out)
    filtered = spark.read.parquet(out).filter(F.col("order_year") == 1997)
    text = _plan(filtered)
    assert "PartitionFilters" in text
    assert "order_year" in text.split("PartitionFilters", 1)[1].split("\n")[0]
    got_years = {r["order_year"] for r in filtered.select("order_year").distinct().collect()}
    assert got_years == {1997}


def test_watermark_drops_late_events(spark, tmp_path):
    import pandas as pd

    src = str(tmp_path / "stream_src")
    # batch 1: minutes 0-120 → advances the watermark to ~110min
    b1 = pd.DataFrame(
        {
            "event_id": range(100),
            "ts": pd.to_datetime("2024-01-01") + pd.to_timedelta(
                [int(i * 1.2) for i in range(100)], unit="m"
            ),
            "user_id": [i % 7 for i in range(100)],
            "event_type": ["click"] * 100,
            "value": [1.0] * 100,
            "props": ["{}"] * 100,
        }
    )
    # batch 2: stale events at minute 0-10 — far beyond the 10m watermark
    b2 = b1.head(10).assign(event_id=range(1000, 1010))
    import os

    os.makedirs(src)
    # write batch 1 BEFORE starting; batch 2 lands while the query is
    # live — guarantees the watermark has advanced when the stale rows
    # arrive (directory globbing with close mtimes doesn't order files)
    spark.createDataFrame(b1).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(
            "event_id bigint, ts timestamp, user_id bigint, event_type string, "
            "value double, props string"
        )
        .parquet(src)
    )
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "15 minutes"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("window.start").alias("w"), "n")
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("late_test")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()  # batch 1 → watermark ≈ max(ts) − 10 min
        spark.createDataFrame(b2).coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()  # batch 2: stale rows vs advanced watermark
    finally:
        q.stop()
    got = {r["w"]: r["n"] for r in spark.sql("SELECT * FROM late_test").collect()}
    # the first 15-min window must contain ONLY batch-1 events (13 of
    # them: minutes 0..14.4); the 10 stale duplicates were dropped
    first_window = min(got)
    assert got[first_window] == 13, got
    total = sum(got.values())
    assert total <= 100  # none of the late batch leaked in


def test_aqe_handles_skewed_join(spark):
    """Skew-join sanity: a 100k-row hot-key join completes with AQE on
    and produces the exact expected row count (plan-level skew splitting
    is version-dependent; the contract here is correctness under skew)."""
    left = spark.range(100_000).select(
        F.when(F.col("id") % 100 < 99, F.lit(1)).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("payload"),
    )
    right = spark.range(50).select(F.col("id").alias("k"), F.lit("dim").alias("tag"))
    joined = left.join(right, "k")
    hot = 100_000 * 99 // 100
    assert joined.count() == hot + left.filter((F.col("k") > 1) & (F.col("k") < 50)).count()


def test_watermark_drop_metrics_observed(spark, tmp_path):
    """The drops proven above must also be OBSERVABLE: progress metrics
    report the dropped-late-row count and a bounded state size — what a
    production alert hooks onto."""
    import os

    import pandas as pd

    from etl_sentinel_imagery_spark.streaming.events import (
        collect_state_metrics,
    )

    src = str(tmp_path / "metrics_src")
    b1 = pd.DataFrame(
        {
            "event_id": range(100),
            "ts": pd.to_datetime("2024-01-01")
            + pd.to_timedelta([int(i * 1.2) for i in range(100)], unit="m"),
            "user_id": [i % 7 for i in range(100)],
            "event_type": ["click"] * 100,
            "value": [1.0] * 100,
            "props": ["{}"] * 100,
        }
    )
    b2 = b1.head(10).assign(event_id=range(1000, 1010))
    os.makedirs(src)
    spark.createDataFrame(b1).coalesce(1).write.mode("append").parquet(src)
    stream = spark.readStream.schema(
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string"
    ).parquet(src)
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "15 minutes"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("metrics_test")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        spark.createDataFrame(b2).coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
        metrics = collect_state_metrics(q)
    finally:
        q.stop()
    # numRowsDroppedByWatermark counts STATE-OPERATOR input rows: the 10
    # stale events share one 15-min window, so map-side partial
    # aggregation collapses them into a single window row before the
    # watermark filter — 1 dropped state row == the whole late batch
    assert metrics["rows_dropped_by_watermark"] == 1
    assert 0 < metrics["max_state_rows"] <= 10  # open 15-min windows only
