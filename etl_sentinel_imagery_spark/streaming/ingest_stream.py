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

from pyspark.sql import DataFrame, SparkSession

__all__ = ["copy_step", "start_copy_stream"]


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
