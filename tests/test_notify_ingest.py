"""File-notification streaming ingest (round 12 — carried ROADMAP
item): the inotify DirWatcher, and copy_notify_loop's contract that
notifications are a latency lever over the ledger, never a
correctness dependency."""

from __future__ import annotations

import os
import threading
import time

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from etl_sentinel_imagery_spark.sources.notify import DirWatcher
from etl_sentinel_imagery_spark.streaming.ingest_stream import (
    copy_notify_loop,
    start_copy_notify_stream,
)
from etl_sentinel_imagery_spark.operators.txlog import (
    init_table,
    snapshot,
)

pytestmark = pytest.mark.skipif(
    not DirWatcher.supported(), reason="inotify requires Linux"
)


def _drop(d: str, name: str, ids) -> str:
    os.makedirs(d, exist_ok=True)
    tmp = os.path.join(d, f"._tmp_{name}")
    pq.write_table(
        pa.table({"doc_id": pa.array(list(ids), pa.int64())}), tmp
    )
    final = os.path.join(d, name)
    os.rename(tmp, final)  # the atomic-upload idiom → IN_MOVED_TO
    return final


def _seed(spark):
    return spark.range(0).select(F.col("id").alias("doc_id"))


# ---------------------------------------------------------------- #
# DirWatcher unit                                                   #
# ---------------------------------------------------------------- #


def test_dirwatcher_event_and_timeout(tmp_path):
    d = str(tmp_path / "land")
    os.makedirs(d)
    with DirWatcher(d) as w:
        t0 = time.monotonic()
        assert w.wait(0.2) is False  # quiet dir: times out
        assert time.monotonic() - t0 < 2.0

        _drop(d, "a.parquet", range(3))
        assert w.wait(5.0) is True  # event arrives ~instantly

        # drained: a second wait with nothing new times out again
        assert w.wait(0.2) is False


def test_dirwatcher_burst_drains_to_one_wakeup(tmp_path):
    d = str(tmp_path / "land")
    os.makedirs(d)
    with DirWatcher(d) as w:
        for i in range(10):
            _drop(d, f"f{i}.parquet", range(i, i + 1))
        assert w.wait(5.0) is True
        # the whole burst coalesced into that one True; buffer empty
        assert w.wait(0.2) is False


def test_dirwatcher_unsupported_path_raises(tmp_path):
    with pytest.raises(OSError):
        DirWatcher(str(tmp_path / "missing-dir"))


# ---------------------------------------------------------------- #
# the ingest loop                                                   #
# ---------------------------------------------------------------- #


def test_notify_loop_ingests_on_event_exactly_once(spark, tmp_path):
    """Files dropped while the loop is blocked on inotify land in the
    table well before the poll fallback could have seen them, and the
    ledger keeps everything exactly-once across bursts + re-drops."""
    land = str(tmp_path / "land")
    os.makedirs(land)
    t = str(tmp_path / "tbl")
    init_table(spark, t, _seed(spark))
    _drop(land, "pre.parquet", range(10))  # present BEFORE start

    batches: list[dict] = []
    h = start_copy_notify_stream(
        spark, land, t, poll_fallback_s=120.0, on_batch=batches.append
    )
    try:
        deadline = time.monotonic() + 30
        while time.monotonic() < deadline:
            if sum(b["files_loaded"] for b in batches) >= 1:
                break
            time.sleep(0.1)
        assert snapshot(spark, t).count() == 10  # startup scan

        _drop(land, "b.parquet", range(10, 15))
        _drop(land, "c.parquet", range(15, 20))
        deadline = time.monotonic() + 30
        while time.monotonic() < deadline:
            if sum(b["files_loaded"] for b in batches) >= 3:
                break
            time.sleep(0.1)
        # poll_fallback_s is 120 — only a notification can explain
        # these files landing inside the 30 s window
        assert snapshot(spark, t).count() == 20
    finally:
        totals = h.stop()
    assert not h.is_active
    assert totals is not None and totals["used_notifications"]
    assert totals["files_loaded"] == 3
    assert totals["notified"] >= 1
    # exactly-once held: no doc_id loaded twice
    df = snapshot(spark, t)
    assert df.count() == df.select("doc_id").distinct().count() == 20


def test_notify_loop_pure_polling_fallback(spark, tmp_path, monkeypatch):
    """With inotify unavailable the loop degrades to the fallback
    poll — same exactly-once semantics, no caller-visible change."""
    monkeypatch.setattr(DirWatcher, "supported", staticmethod(lambda: False))
    land = str(tmp_path / "land")
    os.makedirs(land)
    t = str(tmp_path / "tbl")
    init_table(spark, t, _seed(spark))
    _drop(land, "a.parquet", range(7))

    stop = threading.Event()
    out: dict = {}

    def run():
        out.update(
            copy_notify_loop(
                spark, land, t, poll_fallback_s=0.3, stop=stop
            )
        )

    th = threading.Thread(target=run, daemon=True)
    th.start()
    try:
        deadline = time.monotonic() + 30
        while time.monotonic() < deadline:
            if snapshot(spark, t).count() == 7:
                break
            time.sleep(0.1)
        _drop(land, "b.parquet", range(7, 9))
        deadline = time.monotonic() + 30
        while time.monotonic() < deadline:
            if snapshot(spark, t).count() == 9:
                break
            time.sleep(0.1)
        assert snapshot(spark, t).count() == 9
    finally:
        stop.set()
        th.join(30)
    assert out["used_notifications"] is False
    assert out["files_loaded"] == 2 and out["fallback_polls"] >= 1


def test_notify_loop_rejects_wildcard_source(spark, tmp_path):
    with pytest.raises(ValueError, match="direct landing DIRECTORY"):
        copy_notify_loop(
            spark, str(tmp_path / "*" / "land"), str(tmp_path / "t")
        )


def test_notify_stream_stop_is_prompt(spark, tmp_path):
    """stop() returns well within the 120 s fallback window — the
    select slicing honors the stop event."""
    land = str(tmp_path / "land")
    os.makedirs(land)
    t = str(tmp_path / "tbl")
    init_table(spark, t, _seed(spark))
    h = start_copy_notify_stream(spark, land, t, poll_fallback_s=120.0)
    time.sleep(1.0)  # let it reach the blocked wait
    t0 = time.monotonic()
    h.stop()
    assert time.monotonic() - t0 < 10.0
    assert not h.is_active
