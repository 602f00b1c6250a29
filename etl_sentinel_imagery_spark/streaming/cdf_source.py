"""The transaction log as a STREAMING SOURCE — tail the change data
feed with a checkpointed cursor.

``streaming.events.run_foreach_batch_to_txlog`` made the txlog an
exactly-once streaming SINK; this module closes the loop on the read
side: a consumer that tails :func:`operators.txlog.table_changes`
from a durably-checkpointed last-consumed version, one micro-batch
per committed version range. Together they chain tables into
incremental pipelines (the Delta "table as a stream" pattern —
bronze→silver→gold — without a continuous query per hop).

Design: PULL micro-batches over the manifest log, not a custom
Source implementation.

- The micro-batch OFFSET is the committed table version — already
  durable, totally ordered, and atomic (the manifest claim). There is
  nothing for a Kafka-style offset tracker to add; the cursor is just
  "last version consumed", one integer, written with the same
  tmp+rename atomicity the txlog pointer uses.
- The CHANGE ROWS per batch are computed by ``table_changes`` — fully
  DISTRIBUTED Spark reads of only the commits' touched files (the
  100 TB property: batch cost tracks the delta, not the table), with
  all commit types handled: appends stream inserts, deletion-vector
  and rewrite deletes stream exactly their dropped rows, compactions
  are skipped as content-neutral.
- Delivery is at-least-once at the transport level (process, THEN
  advance the cursor) and exactly-once END-TO-END when the processor
  is idempotent per version range. :func:`cdf_append_sink` provides
  that for txlog destinations: each batch commits under an op tag
  naming its range, so a replayed range finds its tag in history and
  skips — the same idempotence contract as the streaming sink, keyed
  by SOURCE versions instead of epoch ids.
- :func:`start_cdf_stream` wraps the pull step in a real Structured
  Streaming query (a rate tick drives trigger cadence; the tick
  payload is ignored). The alternative — a custom Python DataSource
  stream reader — would either funnel rows through the driver
  (SimpleDataStreamReader) or re-implement the multiset diff outside
  Spark in per-partition pyarrow; the pull form keeps every byte of
  change computation on executors.

Reference anchor: the reference repo (570-line batch ETL,
/root/reference/code/*.py) has no incremental consumption at all —
this is north-star scope (SURVEY.md §2.10), the streaming sibling of
the batch CDF landed in round 4.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_sentinel_imagery_spark.operators.txlog import (
    current_version,
    table_changes,
)


class CdfCursor:
    """Durable last-consumed-version cursor: one integer under
    ``checkpoint_dir/_CURSOR``, written tmp+``os.replace`` (atomic on
    POSIX — the txlog pointer's own discipline). ``advance`` refuses
    to move backward, so a stale writer can't rewind a consumer."""

    def __init__(self, checkpoint_dir: str):
        os.makedirs(checkpoint_dir, exist_ok=True)
        self._path = os.path.join(checkpoint_dir, "_CURSOR")

    def read(self, initial_version: int = -1) -> int:
        try:
            with open(self._path) as f:
                return int(json.load(f)["version"])
        except FileNotFoundError:
            return initial_version

    def advance(self, version: int) -> None:
        cur = self.read(initial_version=-(10**9))
        if version < cur:
            raise ValueError(
                f"cursor would move backward ({cur} -> {version})"
            )
        tmp = self._path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"version": version}, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self._path)


def _clamp_by_files(
    table_dir: str, from_v: int, to_v: int, max_files: int
) -> int:
    """maxFilesPerTrigger for the foreachBatch wrapper: clamp the
    range end where the pending commits' added-file count crosses the
    cap (at least one version always admitted) — same contract as the
    DataSource stream reader's admission control, manifest reads
    only."""
    from etl_sentinel_imagery_spark.operators.txlog import (
        read_manifest,
    )

    files = 0
    for v in range(from_v + 1, to_v + 1):
        m = read_manifest(table_dir, v)
        adds = m.get("adds")
        if adds is None:
            adds = m.get("files") or []
        files += len(adds)
        if files > max_files and v > from_v + 1:
            return v - 1
    return to_v


def cdf_step(
    spark: SparkSession,
    table_dir: str,
    checkpoint_dir: str,
    process,
    initial_version: int = -1,
    max_versions: int | None = None,
    include_rewrites: bool = False,
    max_files: int | None = None,
):
    """ONE micro-batch: consume the change feed for versions
    ``(cursor, to]`` where ``to`` is the current committed version
    (bounded by ``max_versions`` per batch), call
    ``process(changes_df, (from_v, to_v))``, then atomically advance
    the cursor. Returns the consumed ``(from_v, to_v)`` range, or
    ``None`` when already caught up.

    Crash contract: process-then-advance. A crash after ``process``
    but before the cursor write REPLAYS the identical range on
    restart — the range (not a wall-clock batch id) is the replay
    key, so an idempotent processor (:func:`cdf_append_sink`)
    delivers exactly-once end-to-end. ``initial_version=-1`` streams
    the init commit's rows too; pass the current version to tail only
    future changes."""
    cursor = CdfCursor(checkpoint_dir)
    from_v = cursor.read(initial_version)
    to_v = current_version(table_dir)
    if max_versions is not None:
        to_v = min(to_v, from_v + max_versions)
    if max_files is not None and to_v > from_v:
        to_v = _clamp_by_files(table_dir, from_v, to_v, max_files)
    if to_v <= from_v:
        return None
    changes = table_changes(
        spark, table_dir, from_v, to_v, include_rewrites=include_rewrites
    )
    process(changes, (from_v, to_v))
    cursor.advance(to_v)
    return (from_v, to_v)


def drain_table_changes(
    spark: SparkSession,
    table_dir: str,
    checkpoint_dir: str,
    process,
    initial_version: int = -1,
    max_versions: int | None = None,
    include_rewrites: bool = False,
    max_files: int | None = None,
) -> list:
    """Run :func:`cdf_step` until the cursor catches the table's
    current version; returns the list of consumed ranges. The batch
    twin of a ``processAllAvailable`` drain."""
    out = []
    while True:
        r = cdf_step(
            spark,
            table_dir,
            checkpoint_dir,
            process,
            initial_version,
            max_versions,
            include_rewrites,
            max_files,
        )
        if r is None:
            return out
        out.append(r)


def cdf_append_sink(dst_table_dir: str, app_id: str = "cdf"):
    """An idempotent batch processor appending change rows into a
    DESTINATION txlog table — the exactly-once leg. Each range commits
    under op tag ``cdf_<from>_<to>`` and a ``txn=(app_id, to_v)``
    watermark (the Delta SetTransaction design): ranges from one
    cursor are contiguous, so ``to_v <= watermark`` detects a replayed
    range in O(CHECKPOINT_EVERY) via :func:`resolve_txns` — not an
    O(history) tag scan per micro-batch — and a PARTIALLY overlapping
    range (a crash between delivery and the cursor advance, retried
    after the source head moved) delivers only the rows with
    ``_commit_version`` past the watermark. A lost manifest-claim race
    retries on the fresh parent (data files are already staged — only
    the claim races). The destination accumulates the raw feed
    (``_change_type`` / ``_commit_version`` columns included), so any
    additive aggregate over it folds the stream exactly. ``app_id``
    must uniquely name the (source, cursor) pair when several feeds
    land in one destination table.

    COLUMN-MAPPED destinations work live: batches write under the
    destination's current logical→physical mapping (new feed columns
    get fresh physical assignments, and the destination schema WIDENS
    by union rather than being replaced — a rename on the destination
    between batches means the feed's old name re-enters as a NEW
    column with its own physical identity, never resurrecting the
    renamed one; Delta's behavior). A rename that lands BETWEEN this
    sink's staging and its claim is detected in the retry loop and
    surfaces as :class:`TxConflict` — the staged files carry
    pre-rename physical names, so committing them would bind values
    to the wrong columns; the range was never committed, so the
    stream's restart replays it cleanly under the new mapping."""
    from etl_sentinel_imagery_spark.operators.txlog import (
        TxConflict,
        _assign_physical,
        _commit_delta,
        _enforce_constraints,
        _merge_schema_json,
        _move_in_data_files,
        current_version as dst_version,
        init_table,
        read_manifest,
        resolve_constraints,
        resolve_mapping,
        resolve_schema,
        resolve_txns,
    )

    def _process(changes: DataFrame, version_range) -> None:
        from_v, to_v = version_range
        spark = changes.sparkSession
        if not os.path.exists(os.path.join(dst_table_dir, "_txlog")):
            try:
                init_table(spark, dst_table_dir)
            except TxConflict:
                pass
        tag = f"cdf_{from_v}_{to_v}"
        wm = resolve_txns(dst_table_dir).get(app_id, -(10**9))
        if to_v <= wm:
            return  # replayed range: already delivered
        if from_v < wm:
            # PARTIAL overlap: a crash between process() and the
            # cursor advance leaves the cursor at from_v while this
            # sink's watermark sits at the crashed run's to_v; the
            # retried step recomputes its range end from the (possibly
            # advanced) source head, so (from_v, new_to_v] covers
            # versions the crashed run already committed. Delivering
            # the whole range would duplicate them — filter to the
            # versions strictly past the watermark (the feed carries
            # _commit_version), keeping exactly-once for additive
            # folds across the crash.
            changes = changes.where(F.col("_commit_version") > wm)
        m = read_manifest(dst_table_dir)
        stat_cols = m.get("stat_cols") or None
        # inherit a pre-created destination's hive layout (same rule
        # as append() and the epoch sink)
        partition_cols = m.get("partition_cols") or None
        _enforce_constraints(
            changes, resolve_constraints(dst_table_dir)
        )
        # column-mapped destination: widen the recorded schema by
        # union (never replace — a pre-created or renamed destination
        # keeps its columns) and write under the current mapping with
        # fresh physical names for new feed columns, exactly as
        # append() does
        merged = _merge_schema_json(
            resolve_schema(dst_table_dir), changes.schema
        )
        mapping = resolve_mapping(dst_table_dir)
        # pre-assignment state: _assign_physical mutates in place, and
        # the conflict check below must compare the DESTINATION's
        # mapping against what we staged FROM, not our own additions
        pre_map = dict(mapping["map"])
        pre_retired = list(mapping.get("retired", []))
        upd = _assign_physical(
            mapping,
            [f["name"] for f in json.loads(merged)["fields"]],
        )
        names = _move_in_data_files(
            spark, dst_table_dir, changes, stat_cols, partition_cols,
            mapping=upd or mapping,
        )
        while True:
            parent = dst_version(dst_table_dir)
            try:
                _commit_delta(
                    dst_table_dir, parent, names, [], tag, stat_cols,
                    partition_cols,
                    schema_json=merged,
                    txn=(app_id, to_v),
                    column_mapping=upd,
                )
                return
            except TxConflict:
                if to_v <= resolve_txns(dst_table_dir).get(
                    app_id, -(10**9)
                ):
                    return
                # a concurrent RENAME/DROP invalidates the staged
                # files' physical names — surface the conflict; the
                # uncommitted range replays under the new mapping on
                # restart
                now = resolve_mapping(dst_table_dir)
                if (
                    now["map"] != pre_map
                    or list(now.get("retired", [])) != pre_retired
                ):
                    raise

    return _process


def cdf_replicate_sink(
    dst_table_dir: str,
    key_col: str | list[str],
    app_id: str = "cdf-replicate",
    transform=None,
):
    """ROW-IDENTICAL incremental replication: each consumed CDF range
    applies to the destination as ONE ``apply_changes`` commit
    (net-state per key: pre-images and dead keys DV-delete, final
    rows insert), exactly-once via the SetTransaction watermark — the
    downstream table mirrors the upstream through appends, deletes,
    merges and restores while reading only each range's touched
    files. ``key_col`` may be a list (composite natural keys — the
    round-9 tuple contract flows straight through to
    ``apply_changes``). Unlike :func:`cdf_append_sink` (which accumulates the RAW
    feed for additive folds), the destination here IS the upstream
    table, row for row. Requires a key-unique upstream (the upsert
    invariant). Partially overlapping ranges (the crash-retry shape
    :func:`cdf_append_sink` filters by watermark) need no filter here:
    the net state per key over a superset range IS the state at its
    end, and re-applying an already-applied final state is
    row-identical (the upsert re-lands the same row; the delete probe
    misses) — idempotence comes from the semantics, not the tag.

    ``transform`` turns the mirror into a DERIVED table (the
    medallion silver hop as one commit per range): it maps the
    changes DataFrame before application and must (a) keep
    ``key_col`` and the ``_change_type`` / ``_commit_version``
    columns, and (b) be DETERMINISTIC per row (replays re-apply it).
    Filtering INSERT rows derives a row-subset table — keep the
    delete rows flowing so upstream deletes still propagate (a
    delete for a key the filter never admitted nets to a no-op
    DV-probe miss, which is fine)."""
    from etl_sentinel_imagery_spark.operators.txlog import (
        TxConflict,
        apply_changes,
        init_table,
        resolve_txns,
    )

    def _process(changes: DataFrame, version_range) -> None:
        from_v, to_v = version_range
        spark = changes.sparkSession
        if not os.path.exists(os.path.join(dst_table_dir, "_txlog")):
            try:
                init_table(spark, dst_table_dir)
            except TxConflict:
                pass
        if to_v <= resolve_txns(dst_table_dir).get(app_id, -(10**9)):
            return  # replayed range: already applied
        if transform is not None:
            changes = transform(changes)
        while True:
            try:
                apply_changes(
                    spark,
                    dst_table_dir,
                    changes,
                    key_col,
                    txn=(app_id, to_v),
                    op=f"cdf_apply_{from_v}_{to_v}",
                )
                return
            except TxConflict:
                if to_v <= resolve_txns(dst_table_dir).get(
                    app_id, -(10**9)
                ):
                    return

    return _process


def cdf_upsert_sink(
    dst_table_dir: str,
    key_col: str | list[str],
    app_id: str = "cdf-upsert",
    transform=None,
):
    """UPSERT-MODE silver tables: each consumed CDF range nets to its
    final-state rows per key (:func:`operators.txlog._net_changes`)
    and applies as ONE ``merge_upsert`` commit — the medallion
    latest-state pattern where the downstream keeps every key it has
    ever seen at its most recent upstream value. Upstream DELETES
    intentionally do NOT propagate (the key stays at its last state —
    the slowly-changing-dimension shape); use
    :func:`cdf_replicate_sink` when deletes must mirror. Note the
    netting is RANGE-granular (as in any batched net-state applier): a
    key inserted and deleted within ONE consumed range nets to a
    delete and never lands here — keys LIVE upstream always land
    exactly; it is only delete-then-reinsert-free churn inside a batch
    that is invisible (the model test pins this contract). Exactly-once
    via the same SetTransaction watermark as the other sinks: a
    replayed range no-ops, and a partially overlapping crash-retry
    range is harmless because re-merging an already-applied final
    state re-lands the identical row (idempotent by semantics, like
    the replicate sink).

    ``transform`` maps the changes DataFrame before netting — same
    contract as :func:`cdf_replicate_sink`'s hook (keep ``key_col``
    and the feed columns; deterministic per row)."""
    from etl_sentinel_imagery_spark.operators.txlog import (
        TxConflict,
        _net_changes,
        init_table,
        merge_upsert,
        resolve_txns,
    )

    def _process(changes: DataFrame, version_range) -> None:
        from_v, to_v = version_range
        spark = changes.sparkSession
        if not os.path.exists(os.path.join(dst_table_dir, "_txlog")):
            try:
                init_table(spark, dst_table_dir)
            except TxConflict:
                pass
        if to_v <= resolve_txns(dst_table_dir).get(app_id, -(10**9)):
            return  # replayed range: already applied
        if transform is not None:
            changes = transform(changes)
        upserts, _dead = _net_changes(changes, key_col)
        while True:
            try:
                merge_upsert(
                    spark,
                    dst_table_dir,
                    upserts,
                    key_col,
                    txn=(app_id, to_v),
                    op=f"cdf_merge_{from_v}_{to_v}",
                )
                return
            except TxConflict:
                if to_v <= resolve_txns(dst_table_dir).get(
                    app_id, -(10**9)
                ):
                    return

    return _process


def rowid_replicate_sink(
    src_table_dir: str,
    dst_table_dir: str,
    app_id: str = "rowid-replicate",
):
    """KEY-FREE streaming replication: each consumed range applies as
    one ``apply_row_changes`` commit keyed on the source's stable row
    ids — the mirror for tables with no natural key or with duplicate
    rows, where :func:`cdf_replicate_sink`'s key-unique invariant has
    nothing to bind to (row ids are unique by construction). Requires
    row tracking enabled on the source BEFORE the replicated range
    starts. The batch's change rows are ignored; the range bounds
    drive a net row-id diff of the source's manifests directly
    (rewrites inside a range contribute nothing — no op-name trust
    needed). Exactly-once via the same SetTransaction watermark
    discipline as the other sinks; a crash-retry range that partially
    overlaps clamps to the watermark, sound because the row-id diff
    of (wm, to] is exactly the not-yet-applied net."""
    from etl_sentinel_imagery_spark.operators.txlog import (
        TxConflict,
        apply_row_changes,
        init_table,
        resolve_txns,
    )

    def _process(changes: DataFrame, version_range) -> None:
        from_v, to_v = version_range
        spark = changes.sparkSession
        if not os.path.exists(os.path.join(dst_table_dir, "_txlog")):
            try:
                # probe key stats: ids are commit-monotone, so the
                # mirror's DV probes prune by manifest ranges
                init_table(
                    spark, dst_table_dir, stat_cols=["_src_row_id"]
                )
            except TxConflict:
                pass
        wm = resolve_txns(dst_table_dir).get(app_id, -(10**9))
        if to_v <= wm:
            return  # replayed range: already applied
        lo = max(from_v, wm)
        while True:
            try:
                apply_row_changes(
                    spark,
                    src_table_dir,
                    dst_table_dir,
                    lo,
                    to_v,
                    txn=(app_id, to_v),
                )
                return
            except TxConflict:
                if to_v <= resolve_txns(dst_table_dir).get(
                    app_id, -(10**9)
                ):
                    return

    return _process


def start_cdf_stream(
    spark: SparkSession,
    table_dir: str,
    checkpoint_dir: str,
    process,
    initial_version: int = -1,
    rows_per_second: int = 1,
):
    """The pull loop as a live Structured Streaming query: a rate
    tick drives trigger cadence (its payload is ignored); each
    trigger runs :func:`cdf_step`, which no-ops when caught up. The
    CURSOR checkpoint (not the rate source's offsets) carries the
    consumption state, so the stream can be stopped, its rate
    checkpoint discarded, and restarted anywhere without replaying
    delivered ranges — and an idempotent processor keeps even crash
    replays exactly-once. Returns the started StreamingQuery (caller
    stops it)."""
    ticks = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .load()
    )

    def _tick(_batch_df: DataFrame, _epoch_id: int) -> None:
        while (
            cdf_step(
                spark, table_dir, checkpoint_dir, process, initial_version
            )
            is not None
        ):
            pass

    return (
        ticks.writeStream.foreachBatch(_tick)
        .option(
            "checkpointLocation", os.path.join(checkpoint_dir, "_ticks")
        )
        .outputMode("append")
        .start()
    )
