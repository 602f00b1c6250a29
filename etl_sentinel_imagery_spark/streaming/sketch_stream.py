"""Streaming HLL sketch rollup — distinct-count state that survives
replays for free.

The rollup-table pattern (operators.sketches) run continuously: each
micro-batch's keys fold into a persisted per-group sketch table, so
"distinct users per day" is always one `hll_estimate` away — no raw
event retention, no re-scan. The state is the sketch itself, NOT a
count, which buys two properties a counter cannot offer:

- **Replay idempotence without epoch bookkeeping**: the merge is a
  register-wise max, and max is idempotent — a micro-batch applied
  twice (failure between sink write and checkpoint commit) lands on
  the identical registers. The at-least-once foreachBatch contract
  composes into EXACTLY-ONCE state with zero dedup machinery.
- **Mergeable downstream**: the persisted sketches keep answering
  any-slice rollups (`hll_merge_agg` over any group subset).

Sink shape per batch: sketch the batch (one map-side-combinable
aggregation), full-outer-merge with the persisted table on the group
key, rewrite. The table is one row of m ints per group — control-plane
sized — so the rewrite is the cheap side of the batch; a key-partitioned
MERGE (operators.merge) takes over if groups ever outgrow that.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_sentinel_imagery_spark.operators.sketches import (
    HLL_P,
    hll_merge_cols,
    hll_sketch,
)


_POINTER = "_CURRENT"


def _current_version(table_dir: str) -> str | None:
    """Resolve the committed version directory via the pointer file."""
    ptr = os.path.join(table_dir, _POINTER)
    if not os.path.isfile(ptr):
        return None
    with open(ptr) as f:
        name = f.read().strip()
    path = os.path.join(table_dir, name)
    return path if os.path.isdir(path) else None


def read_sketch_table(spark, table_dir: str) -> DataFrame | None:
    """Read the committed sketch table state (None before first epoch)."""
    cur = _current_version(table_dir)
    return spark.read.parquet(cur) if cur else None


def merge_sketch_table(
    spark,
    batch_sketch: DataFrame,
    table_dir: str,
    group_cols: list[str],
    p: int = HLL_P,
) -> DataFrame:
    """(committed table state if any) ∪ batch sketches, register-wise
    max on group-key collisions. Returns the merged frame."""
    existing = read_sketch_table(spark, table_dir)
    if existing is not None:
        prev = existing.withColumnRenamed("hll", "_prev")
        merged = batch_sketch.withColumnRenamed("hll", "_new").join(
            prev, group_cols, "full_outer"
        )
        empty = F.transform(
            F.sequence(F.lit(0), F.lit((1 << p) - 1)), lambda _: F.lit(0)
        )
        return merged.select(
            *group_cols,
            hll_merge_cols(
                F.coalesce("_new", empty), F.coalesce("_prev", empty)
            ).alias("hll"),
        )
    return batch_sketch


def run_sketch_rollup(
    stream_df: DataFrame,
    group_cols: list[str],
    key_col: str,
    table_dir: str,
    checkpoint_dir: str,
    p: int = HLL_P,
) -> None:
    """foreachBatch sink maintaining the persisted sketch table.

    Crash safety is a versioned-directory + pointer-file protocol, NOT
    a directory-rename dance: each epoch writes a fresh ``v{epoch}``
    directory in full, then commits it with one atomic ``os.replace``
    of the ``_CURRENT`` pointer file. A crash at ANY point leaves the
    pointer naming a complete committed version — the old state is
    never unlinked before the new one is live (a rename-out/rename-in
    swap has a window where the table simply does not exist, and a
    post-crash replay would then rebuild from one batch and delete the
    stranded history). Superseded versions are pruned only AFTER the
    commit, best-effort."""
    spark = stream_df.sparkSession

    def _apply(batch_df: DataFrame, epoch_id: int) -> None:
        import uuid

        if not batch_df.take(1):
            return
        sk = hll_sketch(batch_df, group_cols, key_col, p=p)
        merged = merge_sketch_table(spark, sk, table_dir, group_cols, p=p)
        os.makedirs(table_dir, exist_ok=True)
        # the version name carries a per-ATTEMPT nonce: a replayed epoch
        # lazily READS the committed version while writing the new one,
        # and reusing v{epoch_id} would overwrite the very directory the
        # merge scan is reading (Spark refuses, or worse, the committed
        # state is deleted before the scan runs)
        vname = f"v{epoch_id}_{uuid.uuid4().hex[:8]}"
        merged.write.mode("overwrite").parquet(
            os.path.join(table_dir, vname)
        )
        ptr_tmp = os.path.join(table_dir, f"{_POINTER}.tmp{epoch_id}")
        with open(ptr_tmp, "w") as f:
            f.write(vname)
        os.replace(ptr_tmp, os.path.join(table_dir, _POINTER))  # commit
        import shutil

        for entry in os.listdir(table_dir):
            if entry.startswith("v") and entry != vname:
                shutil.rmtree(os.path.join(table_dir, entry), ignore_errors=True)

    q = (
        stream_df.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def run_additive_sketch_rollup(
    stream_df: DataFrame,
    group_cols: list[str],
    key_col: str,
    value_col: str,
    table_dir: str,
    checkpoint_dir: str,
    k: int = 8,
    edges: list[float] | None = None,
) -> None:
    """Streaming rollup for the ADDITIVE sketches (top-k heavy hitters,
    histograms) — the ones register-max idempotence does NOT save.

    A replayed micro-batch merged into shared state would double its
    counts, so unlike :func:`run_sketch_rollup` the state here is
    per-EPOCH: each batch writes its own sketch rows into an
    ``epoch_id=`` partition with dynamic partition overwrite — a replay
    rewrites exactly its own partition (the same recipe as
    streaming.events.run_foreach_batch_to_parquet). Readers get the
    rolled-up answer by merging across epochs with the sketches' own
    aggregates (`topk_merge_agg` / `histogram_merge_agg`), which is the
    mergeability property doing the exactly-once work at read time."""
    from etl_sentinel_imagery_spark.operators.sketches import (
        histogram_sketch,
        topk_sketch,
    )

    hist_edges = edges or [10.0, 50.0, 200.0]

    def _apply(batch_df: DataFrame, epoch_id: int) -> None:
        if not batch_df.take(1):
            return
        top = topk_sketch(batch_df, group_cols, key_col, k=k)
        hist = histogram_sketch(batch_df, group_cols, value_col, hist_edges)
        # LEFT join: histogram_sketch drops a group whose values were
        # all NULL in this batch (COUNT(value) semantics) — an inner
        # join would silently discard that group's top-k sketch too
        zeros = F.array(
            *[F.lit(0).cast("long") for _ in range(len(hist_edges) + 1)]
        )
        (
            top.join(hist, group_cols, "left")
            .withColumn("hist", F.coalesce("hist", zeros))
            .withColumn("epoch_id", F.lit(epoch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("epoch_id")
            .parquet(table_dir)
        )

    q = (
        stream_df.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def run_kll_rollup(
    stream_df: DataFrame,
    group_cols: list[str],
    value_col: str,
    table_dir: str,
    checkpoint_dir: str,
    k: int = 200,
) -> None:
    """Streaming KLL quantile rollup — additive like top-k/histogram
    (a replayed batch merged into shared state would double ``n``), so
    it uses the same epoch-keyed exactly-once recipe: each micro-batch
    sketches its own rows (operators.kll two-phase build) and writes
    them under its ``epoch_id=`` partition with dynamic overwrite.
    Readers answer any-slice quantiles by merging epoch rows with
    ``kll_merge_rows`` — KLL's merge bound does the exactly-once work
    at read time, exactly as mergeability does for the count sketches."""
    from etl_sentinel_imagery_spark.operators.kll import kll_sketch

    def _apply(batch_df: DataFrame, epoch_id: int) -> None:
        if not batch_df.take(1):
            return
        (
            kll_sketch(batch_df, group_cols, value_col, k=k)
            .withColumn("epoch_id", F.lit(epoch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("epoch_id")
            .parquet(table_dir)
        )

    q = (
        stream_df.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def run_cm_rollup(
    stream_df: DataFrame,
    group_cols: list[str],
    key_col: str,
    table_dir: str,
    checkpoint_dir: str,
    w: int = 256,
    d: int = 4,
) -> None:
    """Streaming Count-Min rollup — the additive epoch-keyed recipe
    (run_additive_sketch_rollup's exactly-once argument verbatim):
    each micro-batch writes its own CM grid into an ``epoch_id=``
    partition with dynamic overwrite, replays rewrite exactly their
    partition, and readers merge epochs with ``cm_merge_agg`` — the
    sketch's element-wise additivity does the exactly-once work at
    read time. Point-query the merged grid with ``cm_estimate``."""
    from etl_sentinel_imagery_spark.operators.sketches import cm_sketch

    def _apply(batch_df: DataFrame, epoch_id: int) -> None:
        if not batch_df.take(1):
            return
        (
            cm_sketch(batch_df, group_cols, key_col, w=w, d=d)
            .withColumn("epoch_id", F.lit(epoch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("epoch_id")
            .parquet(table_dir)
        )

    q = (
        stream_df.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
