"""Structured Streaming event analytics (SURVEY.md §2.10 extensions).

The reference is batch-only; these are the streaming-native forms of the
batch queries in queries.events_q, sharing semantics with the DuckDB-
oracled batch versions (same windows, same session gap). Each builder
takes a streaming DataFrame (``spark.readStream``) and returns the
transformed streaming DataFrame; ``run_to_memory`` drives any of them to
completion over a bounded source for tests (memory sink +
processAllAvailable — the documented local smoke pattern).

Watermarks: 10 minutes — late events beyond that are dropped from
windowed state; state stores stay bounded at scale.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EVENTS_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string, "
    "value double, props string"
)

WATERMARK = "10 minutes"


def read_events_stream(spark: SparkSession, parquet_dir_or_file: str) -> DataFrame:
    """Bounded-source streaming read for local smoke; production swaps in
    kafka/kinesis with the same downstream graph."""
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .format("parquet")
        .load(parquet_dir_or_file)
    )


def tumbling_counts(events: DataFrame, width: str = "15 minutes") -> DataFrame:
    """Streaming tumbling-window counts per event type (append mode)."""
    return (
        events.withWatermark("ts", WATERMARK)
        .groupBy(F.window("ts", width), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("total_value"),
        )
        .select(
            F.col("window.start").alias("bucket_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def session_aggregates(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Native session windows (F.session_window) — the streaming twin of
    the batch lag+cumsum sessionization."""
    return (
        events.withWatermark("ts", WATERMARK)
        .groupBy(F.session_window("ts", gap), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


def dedup_within_watermark(events: DataFrame) -> DataFrame:
    """Keyed streaming dedup with bounded state."""
    return events.withWatermark("ts", WATERMARK).dropDuplicatesWithinWatermark(
        ["user_id", "event_type"]
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: per-user
    running event count + value total, emitted once per micro-batch —
    the engine's template for operators Spark lacks natively."""

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [user_id], "n_events": [n], "total_value": [total]}
        )

    return (
        events.withWatermark("ts", WATERMARK)
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType="user_id bigint, n_events bigint, total_value double",
            stateStructType="n bigint, total double",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def sliding_user_activity(events: DataFrame) -> DataFrame:
    """Streaming sliding windows (10 min window / 5 min slide)."""
    return (
        events.withWatermark("ts", WATERMARK)
        .groupBy(F.window("ts", "10 minutes", "5 minutes"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.approx_count_distinct("user_id").alias("approx_users"),
        )
        .select(
            F.col("window.start").alias("window_start"), "n_events", "approx_users"
        )
    )


def purchases_with_recent_click(
    events: DataFrame, window: str = "30 minutes", how: str = "inner"
) -> DataFrame:
    """Stream-stream interval join: each purchase joined to the same
    user's click events within the preceding ``window``.

    Both sides carry watermarks so the join state is bounded: Spark can
    discard click state older than watermark + interval. The join
    condition is the same (t−w, t] interval as the batch as-of/range
    operators (operators.asof), making the batch queries the semantic
    oracle for this streaming form.

    ``how="left_outer"``: purchases with NO qualifying click still emit
    (NULL click columns) — but only once the watermark passes their
    join horizon, because until then a matching click could still
    arrive. That is Spark's outer stream-stream join contract: the
    watermark is what makes "no match" a decidable fact, which is why
    outer joins REQUIRE both the watermark and the event-time range
    condition this join carries."""
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("click_ts"),
            F.col("event_id").alias("click_id"),
        )
        .withWatermark("click_ts", WATERMARK)
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select("user_id", F.col("ts").alias("purchase_ts"),
                F.col("event_id").alias("purchase_id"), "value")
        .withWatermark("purchase_ts", WATERMARK)
    )
    return purchases.join(
        clicks,
        (F.col("user_id") == F.col("c_user"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (F.col("click_ts") > F.col("purchase_ts") - F.expr(f"INTERVAL {window}")),
        how,
    ).select("purchase_id", "user_id", "purchase_ts", "click_id", "click_ts", "value")


def enrich_with_dimension(
    events: DataFrame, dim: DataFrame, key: str = "user_id"
) -> DataFrame:
    """Stream-static enrichment join: each event picks up its dimension
    attributes (the streaming analog of the batch broadcast point-lookup,
    J3). The static side is broadcast — per micro-batch Spark re-plans
    the join, so a small dimension never shuffles the stream, and an
    updated dimension snapshot is picked up on the next batch without
    restarting the query. No watermark needed: stream-static joins keep
    no join state."""
    return events.join(F.broadcast(dim), key, "left")


def run_foreach_batch_to_parquet(
    stream_df: DataFrame, out_dir: str, checkpoint_dir: str
) -> None:
    """foreachBatch sink: exactly-once via per-epoch idempotent writes.

    Each micro-batch lands in its own epoch_id partition with DYNAMIC
    partition overwrite — a replayed epoch (failure between sink write
    and checkpoint commit) rewrites exactly its own partition instead of
    appending duplicates. Append mode would be at-least-once."""

    def _write(batch_df: DataFrame, epoch_id: int) -> None:
        (
            batch_df.withColumn("epoch_id", F.lit(epoch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("epoch_id")
            .parquet(out_dir)
        )

    q = (
        stream_df.writeStream.foreachBatch(_write)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def run_foreach_batch_upsert(
    stream_df: DataFrame, keys: list[str], out_dir: str, checkpoint_dir: str
) -> None:
    """Streaming UPSERT sink: each update-mode micro-batch MERGEs into a
    keyed parquet table (operators.merge.merge_upsert), so the table
    always holds the latest row per key — the foreachBatch + MERGE
    composition a lakehouse `MERGE INTO` sink would run.

    Replay safety: merge_upsert is idempotent for identical batches
    (matched keys replace, nothing appends twice). The merged frame is
    eagerly localCheckpointed BEFORE the overwrite — reading and
    overwriting the same parquet path in one lazy plan would otherwise
    race the scan against the truncation."""
    from etl_sentinel_imagery_spark.operators.merge import merge_upsert

    def _upsert(batch_df: DataFrame, epoch_id: int) -> None:
        from pyspark.errors import AnalysisException

        spark = batch_df.sparkSession
        batch = batch_df.dropDuplicates(keys)
        # ONLY path-not-found means "first epoch" — any other failure
        # (transient read error, merge failure) must propagate: catching
        # it would overwrite the accumulated table with one batch.
        try:
            target = spark.read.parquet(out_dir)
        except AnalysisException:
            target = None
        if target is None:
            merged = batch
        else:
            merged = merge_upsert(
                target, batch.select(*target.columns), keys
            ).localCheckpoint(eager=True)
        merged.write.mode("overwrite").parquet(out_dir)

    q = (
        stream_df.writeStream.foreachBatch(_upsert)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def run_to_memory(stream_df: DataFrame, name: str, output_mode: str) -> DataFrame:
    """Drive a bounded streaming query to completion into a memory sink
    and return the materialized result table."""
    df, _metrics = run_to_memory_with_metrics(stream_df, name, output_mode)
    return df


def collect_state_metrics(query) -> dict:
    """Watermark/state observability from a StreamingQuery's progress
    events: total rows DROPPED as too-late, and the peak state-store row
    count — the two numbers a production pipeline alerts on (silent late
    drops and unbounded state are the classic streaming failure modes)."""
    import json

    dropped = 0
    max_state_rows = 0
    for p in query.recentProgress:
        prog = p if isinstance(p, dict) else json.loads(p.json)
        for so in prog.get("stateOperators") or []:
            dropped += int(so.get("numRowsDroppedByWatermark", 0) or 0)
            max_state_rows = max(max_state_rows, int(so.get("numRowsTotal", 0) or 0))
    return {
        "rows_dropped_by_watermark": dropped,
        "max_state_rows": max_state_rows,
    }


def run_to_memory_with_metrics(
    stream_df: DataFrame, name: str, output_mode: str
) -> tuple[DataFrame, dict]:
    """run_to_memory + the state metrics gathered over the full run."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .start()
    )
    try:
        q.processAllAvailable()
        metrics = collect_state_metrics(q)
    finally:
        q.stop()
    return stream_df.sparkSession.sql(f"SELECT * FROM {name}"), metrics


def run_foreach_batch_to_txlog(
    stream_df: DataFrame,
    table_dir: str,
    checkpoint_dir: str,
    app_id: str = "epoch-sink",
) -> None:
    """Exactly-once streaming appends into a TRANSACTIONAL table
    (operators.txlog): each micro-batch commits one manifest version
    tagged ``stream_epoch_<id>``, so readers get snapshot isolation
    across batch boundaries (a snapshot never straddles half a batch)
    AND replay idempotence comes from the LOG, not partition layout —
    a replayed epoch finds its tag already in history and skips, the
    manifest-claim race (TxConflict) retries on the fresh parent. This
    is the epoch-partition sink's upgrade: dynamic-overwrite idempotence
    constrains the table to epoch partitioning; the txlog form leaves
    the file layout free.

    Replay detection is the Delta SetTransaction design: each commit
    records ``txn=(app_id, epoch)`` and the check reads the
    checkpoint-bounded :func:`resolve_txns` watermark — O(1)-ish per
    micro-batch, where the previous op-tag scan walked the ENTIRE
    history every epoch (quadratic over a long-lived stream's life).
    Epoch ids are monotonic per run AND across full replays from a
    fresh checkpoint (they restart at 0 ≤ the watermark), so the skip
    rule is ``epoch <= watermark``. ``app_id`` must uniquely name the
    logical stream writing to this table — two different streams
    sharing an app_id would suppress each other (Delta's txnAppId
    rule)."""
    from etl_sentinel_imagery_spark.operators.txlog import (
        TxConflict,
        _commit_delta,
        _enforce_constraints,
        _move_in_data_files,
        current_version,
        init_table,
        read_manifest,
        resolve_constraints,
        resolve_txns,
    )

    def _write(batch_df: DataFrame, epoch_id: int) -> None:
        import os

        spark = batch_df.sparkSession
        if not os.path.exists(os.path.join(table_dir, "_txlog")):
            try:
                init_table(spark, table_dir)
            except TxConflict:
                pass  # another task initialized first
        tag = f"stream_epoch_{epoch_id}"
        if epoch_id <= resolve_txns(table_dir).get(app_id, -1):
            return  # replayed epoch: already committed
        m = read_manifest(table_dir)
        stat_cols = m.get("stat_cols") or None
        # inherit the hive layout exactly as append() does — without
        # this, a stream into a partitioned table would land
        # unpartitioned files under a manifest that declares
        # partition_cols, and basePath reads would NULL those columns
        partition_cols = m.get("partition_cols") or None
        _enforce_constraints(
            batch_df, resolve_constraints(table_dir)
        )
        names = _move_in_data_files(
            spark, table_dir, batch_df, stat_cols, partition_cols
        )
        while True:
            parent = current_version(table_dir)
            try:
                _commit_delta(
                    table_dir, parent, names, [], tag, stat_cols,
                    partition_cols, txn=(app_id, epoch_id),
                )
                return
            except TxConflict:
                # another writer advanced the log; re-read and retry —
                # our data files are already in place, only the
                # manifest claim races
                if epoch_id <= resolve_txns(table_dir).get(app_id, -1):
                    return

    q = (
        stream_df.writeStream.foreachBatch(_write)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
