"""Streaming directory ingest (the Auto Loader shape): the table's
COPY ledger IS the discovery state — exactly-once with a disposable
rate checkpoint, per-trigger admission via max_files_per_trigger."""

from __future__ import annotations

import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from etl_sentinel_imagery_spark.operators.txlog import (
    copy_into,
    current_version,
    init_table,
    snapshot,
)
from etl_sentinel_imagery_spark.streaming.ingest_stream import (
    copy_step,
    start_copy_stream,
)


def _land(d, name, ids):
    os.makedirs(d, exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "k": pa.array(list(ids), pa.int64()),
                "v": pa.array([i * 2 for i in ids], pa.int64()),
            }
        ),
        os.path.join(d, name),
    )


def test_copy_step_admission_and_idempotence(spark, tmp_path):
    src = str(tmp_path / "land")
    for i in range(5):
        _land(src, f"f{i}.parquet", range(10 * i, 10 * i + 10))
    t = str(tmp_path / "t")
    init_table(spark, t, spark.createDataFrame([], "k long, v long"))

    seen = []
    while True:
        stats = copy_step(spark, src, t, max_files_per_trigger=2)
        if stats["files_loaded"] == 0:
            break
        seen.append(stats["files_loaded"])
    assert seen == [2, 2, 1]  # deterministic sorted drain
    assert snapshot(spark, t).count() == 50
    # exactly-once: re-drain loads nothing
    assert copy_step(spark, src, t)["files_loaded"] == 0


def test_copy_stream_live_and_checkpoint_disposable(spark, tmp_path):
    src = str(tmp_path / "land")
    _land(src, "a.parquet", range(10))
    t = str(tmp_path / "t")
    ckpt = str(tmp_path / "ck")
    init_table(spark, t, spark.createDataFrame([], "k long, v long"))

    q = start_copy_stream(spark, src, t, ckpt, rows_per_second=50)
    try:
        q.processAllAvailable()
        assert snapshot(spark, t).count() == 10
        # a late drop is picked up live (let a rate tick accumulate —
        # processAllAvailable returns immediately when no tick is
        # pending at that instant)
        _land(src, "b.parquet", range(100, 105))
        import time as _time

        deadline = _time.time() + 60
        while _time.time() < deadline:
            q.processAllAvailable()
            if snapshot(spark, t).count() == 15:
                break
            _time.sleep(0.25)
        assert snapshot(spark, t).count() == 15
    finally:
        q.stop()

    # the rate checkpoint is DISPOSABLE: discard it, restart, nothing
    # replays (the table's ledger is the state)
    shutil.rmtree(ckpt)
    q2 = start_copy_stream(spark, src, t, ckpt, rows_per_second=50)
    try:
        q2.processAllAvailable()
        assert snapshot(spark, t).count() == 15
    finally:
        q2.stop()


def test_landing_to_curated_medallion(spark, tmp_path):
    """The full ingestion story composed end to end: landing dir →
    COPY (ledger-exactly-once) bronze → change feed → upsert silver
    (latest state per key) → clustered maintenance. A late drop and a
    bronze correction both flow through; replays load nothing twice."""
    from etl_sentinel_imagery_spark.operators.txlog import (
        merge_upsert,
        resolve_files,
        set_properties,
        maintain_table,
    )
    from etl_sentinel_imagery_spark.streaming.cdf_source import (
        cdf_upsert_sink,
        drain_table_changes,
    )

    land = str(tmp_path / "land")
    bronze = str(tmp_path / "bronze")
    silver = str(tmp_path / "silver")
    ck = str(tmp_path / "ck")
    _land(land, "a.parquet", range(10))
    _land(land, "b.parquet", range(10, 20))
    init_table(spark, bronze, spark.createDataFrame([], "k long, v long"))
    sink = cdf_upsert_sink(silver, "k", app_id="med")

    copy_into(spark, bronze, land)
    drain_table_changes(spark, bronze, ck, sink)
    assert snapshot(spark, silver).count() == 20

    # late drop + a bronze correction both flow through the feed
    _land(land, "c.parquet", range(20, 25))
    copy_into(spark, bronze, land)
    merge_upsert(
        spark,
        bronze,
        spark.createDataFrame([(0, 999)], "k long, v long"),
        "k",
    )
    drain_table_changes(spark, bronze, ck, sink)
    snap = snapshot(spark, silver)
    assert snap.count() == 25
    assert snap.where("k = 0").collect()[0]["v"] == 999

    # replay: ledger refuses, feed cursor is caught up, silver stable
    _, stats = copy_into(spark, bronze, land)
    assert stats["files_loaded"] == 0
    assert drain_table_changes(spark, bronze, ck, sink) == []
    assert snapshot(spark, silver).count() == 25

    # clustered maintenance on silver: one nightly call converges it
    set_properties(silver, {"cluster.by": "k"})
    report = maintain_table(spark, silver, vacuum_min_age_seconds=10**9)
    assert report["files_clustered"] >= 1
    assert all(
        e.get("clustered") == "k" for e in resolve_files(silver)
    )
    assert snapshot(spark, silver).count() == 25
