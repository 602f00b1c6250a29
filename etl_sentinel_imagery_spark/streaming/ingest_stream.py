"""Streaming directory ingestion — the Auto Loader shape.

``start_copy_stream`` turns a landing directory into a live ingest
pipeline: a rate tick drives trigger cadence and each trigger runs
:func:`operators.txlog.copy_into`, whose ledger (committed ATOMICALLY
with the rows in one manifest claim) makes discovery exactly-once —
every dropped file loads exactly once however the stream crashes,
restarts, or double-fires, with NO stream-side state at all. The
table IS the checkpoint: unlike Databricks Auto Loader's RocksDB
file-discovery state, there is nothing to lose or rebuild — discard
the rate checkpoint freely, point a brand-new stream at the same
table, and the ledger still refuses re-loads.

Per-trigger cost tracks NEW files (one directory list + a driver
dict subtraction + a distributed read of only the new files —
measured flat in ``tools/stress_copy_into.py``); a caught-up trigger
is sub-second. ``max_files_per_trigger`` bounds a backlog drain the
same way the change-feed caps do: each trigger loads at most that
many files (globbing is sorted, so drains proceed in name order) and
the next trigger continues.

Reference shape: Databricks Auto Loader (cloudFiles) /
``COPY INTO`` scheduled — re-expressed over the engine's own
transactional ledger rather than an external state store.
"""

from __future__ import annotations

import os
import threading
import time

from pyspark.sql import DataFrame, SparkSession

__all__ = [
    "copy_step",
    "start_copy_stream",
    "copy_notify_loop",
    "start_copy_notify_stream",
]


def copy_step(
    spark: SparkSession,
    source_dir: str,
    table_dir: str,
    pattern: str = "*.parquet",
    fmt: str = "parquet",
    options: dict | None = None,
    max_files_per_trigger: int | None = None,
) -> dict:
    """One ingest micro-batch: load up to ``max_files_per_trigger``
    not-yet-ingested files from ``source_dir`` (all of them when
    None). Returns the copy stats dict. Exactly-once by the ledger —
    safe to call concurrently with readers and other writers (the
    commit is an ordinary lock-free append)."""
    from etl_sentinel_imagery_spark.operators.txlog import copy_into

    return copy_into(
        spark, table_dir, source_dir, pattern, fmt,
        options=options, max_files=max_files_per_trigger,
    )[1]


def start_copy_stream(
    spark: SparkSession,
    source_dir: str,
    table_dir: str,
    checkpoint_dir: str,
    pattern: str = "*.parquet",
    fmt: str = "parquet",
    options: dict | None = None,
    max_files_per_trigger: int | None = None,
    rows_per_second: int = 1,
):
    """The live form: a rate tick triggers :func:`copy_step` until
    caught up. The rate checkpoint only paces triggers — consumption
    state lives in the TABLE's ledger, so the checkpoint is
    disposable. Returns the started StreamingQuery (caller stops)."""
    ticks = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .load()
    )

    def _tick(_batch_df: DataFrame, _epoch_id: int) -> None:
        while True:
            stats = copy_step(
                spark, source_dir, table_dir, pattern, fmt, options,
                max_files_per_trigger,
            )
            if stats["files_loaded"] == 0:
                return

    return (
        ticks.writeStream.foreachBatch(_tick)
        .option(
            "checkpointLocation", os.path.join(checkpoint_dir, "_ticks")
        )
        .outputMode("append")
        .start()
    )


def copy_notify_loop(
    spark: SparkSession,
    source_dir: str,
    table_dir: str,
    pattern: str = "*.parquet",
    fmt: str = "parquet",
    options: dict | None = None,
    max_files_per_trigger: int | None = None,
    poll_fallback_s: float = 30.0,
    stop: "threading.Event | None" = None,
    on_batch=None,
) -> dict:
    """FILE-NOTIFICATION ingest (round 12, carried ROADMAP item — Auto
    Loader's ``cloudFiles.useNotifications`` shape): block on inotify
    until a file lands in ``source_dir``, then run the ordinary
    ledger-checked :func:`copy_step` until drained; repeat until
    ``stop`` is set. Returns cumulative stats
    ``{"batches", "files_loaded", "fallback_polls", "notified"}``.

    vs the rate-tick poll of :func:`start_copy_stream`: landing
    latency drops from the tick period to event delivery (~ms), and a
    QUIET landing dir costs zero directory lists between fallback
    polls instead of one per tick. Correctness is UNCHANGED — events
    only decide when to look; the copy ledger (committed atomically
    with the rows) still makes every file load exactly once however
    events are lost, duplicated, or coalesced
    (`sources/notify.py` module docstring states the full contract).

    Every ``poll_fallback_s`` without an event the loop scans anyway
    — the reconciliation pass that makes lost events and inotify
    queue overflow a latency bug, not a data bug. On platforms
    without inotify (:meth:`DirWatcher.supported` False) the loop IS
    that fallback poll, same semantics, no code path change for the
    caller. Direct-dir sources only (the watcher is non-recursive;
    wildcarded dir patterns stay on the polling mode).

    ``on_batch`` (testing/observability seam): called with each
    non-empty copy stats dict."""
    from etl_sentinel_imagery_spark.sources.notify import DirWatcher

    if any(ch in source_dir for ch in "*?["):
        raise ValueError(
            "notify mode takes a direct landing DIRECTORY; use "
            "start_copy_stream for wildcarded patterns"
        )
    stop = stop or threading.Event()
    watcher = None
    if DirWatcher.supported():
        try:
            watcher = DirWatcher(source_dir)
        except OSError:
            watcher = None  # FUSE/odd mounts: degrade to polling
    totals = {
        "batches": 0,
        "files_loaded": 0,
        "fallback_polls": 0,
        "notified": 0,
        "used_notifications": watcher is not None,
    }
    try:
        while not stop.is_set():
            # drain everything currently visible (ledger-deduped)
            loaded_any = False
            while True:
                stats = copy_step(
                    spark, source_dir, table_dir, pattern, fmt,
                    options, max_files_per_trigger,
                )
                if stats["files_loaded"] == 0:
                    break
                loaded_any = True
                totals["batches"] += 1
                totals["files_loaded"] += stats["files_loaded"]
                if on_batch is not None:
                    on_batch(stats)
            if loaded_any:
                continue  # a burst may still be landing — re-scan now
            if watcher is not None:
                # block until an event or the reconcile deadline —
                # in 0.5 s select slices so stop() is honored promptly
                # (select can't watch a threading.Event), but the
                # directory is only LISTED on an event or once per
                # full poll_fallback_s window, never per slice
                deadline = time.monotonic() + poll_fallback_s
                woke = False
                while not stop.is_set():
                    left = deadline - time.monotonic()
                    if left <= 0:
                        break
                    if watcher.wait(min(0.5, left)):
                        woke = True
                        break
                if stop.is_set():
                    break
                if woke:
                    totals["notified"] += 1
                else:
                    totals["fallback_polls"] += 1
            else:
                # Event.wait wakes promptly on stop.set()
                stop.wait(poll_fallback_s)
                totals["fallback_polls"] += 1
    finally:
        if watcher is not None:
            watcher.close()
    return totals


class _NotifyStreamHandle:
    """start/stop handle for the notify ingest thread (the caller-side
    shape of a StreamingQuery, without a fake streaming plan)."""

    def __init__(self, thread: threading.Thread, stop: threading.Event):
        self._thread = thread
        self._stop = stop
        self.totals: dict | None = None

    def stop(self, timeout_s: float = 30.0) -> dict | None:
        self._stop.set()
        self._thread.join(timeout_s)
        return self.totals

    @property
    def is_active(self) -> bool:
        return self._thread.is_alive()


def start_copy_notify_stream(
    spark: SparkSession,
    source_dir: str,
    table_dir: str,
    pattern: str = "*.parquet",
    fmt: str = "parquet",
    options: dict | None = None,
    max_files_per_trigger: int | None = None,
    poll_fallback_s: float = 30.0,
    on_batch=None,
) -> _NotifyStreamHandle:
    """Run :func:`copy_notify_loop` on a daemon thread; returns a
    handle with ``.stop()`` (joins and returns cumulative stats) and
    ``.is_active``. The thread only drives driver-side triggering —
    the actual reads/commits are ordinary Spark jobs submitted from
    it, exactly as foreachBatch would."""
    stop = threading.Event()
    handle: _NotifyStreamHandle | None = None

    def _run():
        totals = copy_notify_loop(
            spark, source_dir, table_dir, pattern, fmt, options,
            max_files_per_trigger, poll_fallback_s, stop, on_batch,
        )
        if handle is not None:
            handle.totals = totals

    t = threading.Thread(
        target=_run, name="copy-notify-ingest", daemon=True
    )
    handle = _NotifyStreamHandle(t, stop)
    t.start()
    return handle
