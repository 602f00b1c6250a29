"""Streaming CDF append sink on a COLUMN-MAPPED destination with live
renames (round-16 #4): a rename between batches makes the feed's old
name re-enter as a NEW column (fresh physical identity — no value
resurrection, Delta's behavior), and a rename racing the sink between
staging and claim surfaces TxConflict with nothing committed, so the
replayed range lands exactly once under the new mapping."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import etl_sentinel_imagery_spark.operators.txlog as tx
from etl_sentinel_imagery_spark.operators.txlog import (
    append,
    init_table,
    rename_column,
    snapshot,
)
from etl_sentinel_imagery_spark.streaming.cdf_source import (
    cdf_append_sink,
    drain_table_changes,
)


def _seed(spark, n=20, offset=0):
    return spark.range(offset, offset + n).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 5).cast("int").alias("grp"),
        (F.col("id") * 3).cast("long").alias("val"),
    )


def test_rename_between_batches_feed_column_reenters_fresh(
    spark, tmp_path
):
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    ckpt = str(tmp_path / "ckpt")
    sink = cdf_append_sink(dst)

    init_table(spark, src, _seed(spark, 20).coalesce(1))
    drain_table_changes(spark, src, ckpt, sink)
    # live rename on the DESTINATION between micro-batches
    rename_column(dst, "val", "val_old")
    append(spark, src, _seed(spark, 10, offset=100))
    drain_table_changes(spark, src, ckpt, sink)

    got = snapshot(spark, dst)
    assert {"val_old", "val"} <= set(got.columns)
    rows = {r["doc_id"]: r for r in got.collect()}
    assert len(rows) == 30
    for d, r in rows.items():
        if d < 100:  # pre-rename rows: values live under the new name
            assert r["val_old"] == d * 3 and r["val"] is None
        else:  # post-rename batches: the feed's 'val' is a NEW column
            assert r["val"] == d * 3 and r["val_old"] is None
    # physical identities never collided (no resurrection)
    mp = tx.resolve_mapping(dst)["map"]
    assert mp["val_old"] == "val" and mp["val"] == "val#2"


class _InterleaveOnce(tx.PosixLogStore):
    def __init__(self, interleave):
        self.fired = False
        self.interleave = interleave

    def claim(self, tmp_path, final_path):
        if not self.fired:
            self.fired = True
            self.interleave()  # recursion lands via the fired branch
            return False
        return super().claim(tmp_path, final_path)


def test_rename_racing_staging_conflicts_then_replays_exactly_once(
    spark, tmp_path
):
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    ckpt = str(tmp_path / "ckpt")
    sink = cdf_append_sink(dst)

    init_table(spark, src, _seed(spark, 20).coalesce(1))
    drain_table_changes(spark, src, ckpt, sink)
    v_before = tx.current_version(dst)

    append(spark, src, _seed(spark, 10, offset=100))
    tx.set_log_store(
        _InterleaveOnce(lambda: rename_column(dst, "grp", "g2"))
    )
    try:
        # the staged files carry pre-rename physical names: committing
        # them would bind values to the wrong columns → conflict
        with pytest.raises(tx.TxConflict):
            drain_table_changes(spark, src, ckpt, sink)
    finally:
        tx.set_log_store(tx.PosixLogStore())
    # nothing but the rename landed; the cursor did not advance
    assert tx.current_version(dst) == v_before + 1
    assert snapshot(spark, dst).count() == 20

    # restart: the uncommitted range replays under the new mapping
    drain_table_changes(spark, src, ckpt, sink)
    got = snapshot(spark, dst)
    assert got.count() == 30
    assert "g2" in got.columns and "grp" in got.columns
    rows = {r["doc_id"]: r for r in got.collect()}
    for d, r in rows.items():
        if d < 100:
            assert r["g2"] == d % 5 and r["grp"] is None
        else:
            assert r["grp"] == d % 5 and r["g2"] is None
    # and a further drain is a no-op (exactly once)
    drain_table_changes(spark, src, ckpt, sink)
    assert snapshot(spark, dst).count() == 30
