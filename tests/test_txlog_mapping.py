"""Column mapping: RENAME COLUMN / DROP COLUMN as pure metadata
commits (Delta's column-mapping design at its core). Data files keep
their PHYSICAL column names forever; the manifest schema speaks
LOGICAL names; `_read_entries` translates. The acceptance bar:

- a rename touches zero files, every historical file serves under the
  new name, and time travel answers each version under ITS OWN name;
- a drop hides the column without rewriting; re-adding the same
  logical name gets a FRESH physical column, so dropped values can
  never silently resurrect;
- every write path (append / merge / DV delete / update) keeps
  working on a mapped table, manifest-stats pruning included (stats
  are keyed by physical name);
- the mapping survives truncate_history, rides checkpoints, pins
  through restore, and travels with shallow clones.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_sentinel_imagery_spark.operators import txlog as tx
from etl_sentinel_imagery_spark.operators.txlog import (
    add_constraint,
    append,
    current_version,
    delete_rows_dv,
    drop_column,
    init_table,
    merge_upsert,
    read_manifest,
    rename_column,
    resolve_files,
    resolve_mapping,
    restore,
    snapshot,
    snapshot_pruned,
    truncate_history,
    update_rows,
)


def _seed(spark, n=40, offset=0):
    return spark.range(offset, offset + n).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 7).cast("int").alias("grp"),
        F.concat(F.lit("m-"), F.col("id")).alias("body"),
    )


def test_rename_is_metadata_only_and_serves_old_files(spark, tmp_path):
    t = str(tmp_path / "rn")
    init_table(spark, t, _seed(spark, 40).repartition(2))
    files_before = {tx._entry_name(e) for e in resolve_files(t)}
    v_pre = current_version(t)
    v = rename_column(t, "body", "text")
    # zero files touched; pure metadata delta
    assert {tx._entry_name(e) for e in resolve_files(t)} == files_before
    m = read_manifest(t, v)
    assert m["adds"] == [] and m["removes"] == []
    assert resolve_mapping(t)["map"] == {"text": "body"}
    # old files answer under the NEW logical name, values intact
    snap = snapshot(spark, t)
    assert snap.columns == ["doc_id", "grp", "text"]
    assert snap.where("text = 'm-7'").count() == 1
    # time travel: each version under its own name
    old = snapshot(spark, t, v_pre)
    assert old.columns == ["doc_id", "grp", "body"]
    assert old.where("body = 'm-7'").count() == 1


def test_writes_compose_on_a_renamed_table(spark, tmp_path):
    """Append / merge / DV delete / update all speak the new logical
    name; files mix physical eras transparently."""
    t = str(tmp_path / "rw")
    init_table(spark, t, _seed(spark, 40).coalesce(1))
    rename_column(t, "body", "text")
    append(
        spark,
        t,
        spark.createDataFrame(
            [(100, 1, "new-100")], ["doc_id", "grp", "text"]
        ),
    )
    merge_upsert(
        spark,
        t,
        spark.createDataFrame(
            [(5, 0, "merged-5")], ["doc_id", "grp", "text"]
        ),
        "doc_id",
    )
    update_rows(spark, t, "doc_id = 6", {"text": F.lit("upd-6")})
    delete_rows_dv(spark, t, "doc_id", [7])
    snap = snapshot(spark, t)
    assert snap.count() == 40  # +1 append, -1 delete
    got = {
        r["doc_id"]: r["text"]
        for r in snap.where(
            F.col("doc_id").isin([5, 6, 100, 8])
        ).collect()
    }
    assert got == {
        5: "merged-5",
        6: "upd-6",
        100: "new-100",
        8: "m-8",
    }
    assert snap.where("doc_id = 7").count() == 0


def test_stats_prune_across_rename(spark, tmp_path):
    """Manifest stats key by PHYSICAL name: files written BEFORE the
    rename still prune range reads and targeted-write probes on the
    renamed column."""
    t = str(tmp_path / "rs")
    init_table(
        spark,
        t,
        _seed(spark, 100).repartitionByRange(4, "doc_id"),
        stat_cols=["doc_id"],
    )
    rename_column(t, "doc_id", "id2")
    df, stats = snapshot_pruned(spark, t, "id2", lo=90)
    assert stats["files_skipped"] >= 2  # pre-rename files still prune
    assert df.count() == 10
    # probe pruning on a targeted write uses the physical key too
    calls = []
    orig = tx._stats_probe_subset

    def spy(entries, col, lo, hi):
        out = orig(entries, col, lo, hi)
        calls.append((col, len(entries), len(out)))
        return out

    tx._stats_probe_subset = spy
    try:
        delete_rows_dv(spark, t, "id2", [95])
    finally:
        tx._stats_probe_subset = orig
    assert calls and calls[0][0] == "doc_id"  # physical key
    assert calls[0][2] < calls[0][1]  # probe actually shrank
    assert snapshot(spark, t).count() == 99


def test_drop_hides_without_rewrite_and_no_resurrection(
    spark, tmp_path
):
    t = str(tmp_path / "dr")
    init_table(spark, t, _seed(spark, 20).coalesce(1))
    files_before = {tx._entry_name(e) for e in resolve_files(t)}
    v_pre = current_version(t)
    drop_column(t, "body")
    assert {tx._entry_name(e) for e in resolve_files(t)} == files_before
    snap = snapshot(spark, t)
    assert snap.columns == ["doc_id", "grp"]
    # time travel still serves the dropped column
    assert snapshot(spark, t, v_pre).where("body = 'm-3'").count() == 1
    # re-adding the same logical name: fresh physical, NULL for old
    # rows — the dropped values must NOT come back
    append(
        spark,
        t,
        spark.createDataFrame(
            [(500, 2, "fresh")], ["doc_id", "grp", "body"]
        ),
    )
    assert resolve_mapping(t)["map"]["body"] == "body#2"
    snap2 = snapshot(spark, t)
    assert snap2.where("body IS NOT NULL").count() == 1
    assert (
        snap2.where("doc_id = 3").collect()[0]["body"] is None
    ), "dropped values resurrected"


def test_rename_drop_refusals(spark, tmp_path):
    t = str(tmp_path / "rf")
    tx.init_table(
        spark, t, _seed(spark, 30), partition_cols=["grp"]
    )
    add_constraint(spark, t, "doc_pos", "doc_id >= 0")
    with pytest.raises(ValueError, match="partition column"):
        rename_column(t, "grp", "g2")
    with pytest.raises(ValueError, match="partition column"):
        drop_column(t, "grp")
    with pytest.raises(ValueError, match="constraint"):
        rename_column(t, "doc_id", "id2")
    with pytest.raises(ValueError, match="constraint"):
        drop_column(t, "doc_id")
    with pytest.raises(ValueError, match="no column"):
        rename_column(t, "nope", "x")
    with pytest.raises(ValueError, match="already exists"):
        rename_column(t, "body", "doc_id")


def test_mapping_survives_truncate_and_checkpoints(spark, tmp_path):
    t = str(tmp_path / "tk")
    init_table(spark, t, _seed(spark, 20))
    rename_column(t, "body", "text")
    for i in range(6):
        append(spark, t, _seed(spark, 3, offset=100 + 10 * i)
               .withColumnRenamed("body", "text"))
    truncate_history(t, keep_versions=2)
    assert resolve_mapping(t)["map"] == {"text": "body"}
    assert snapshot(spark, t).where("text = 'm-3'").count() == 1
    # checkpoints embed the mapping (bounded resolve walk)
    while current_version(t) % tx.CHECKPOINT_EVERY != 0:
        append(
            spark,
            t,
            _seed(spark, 2, offset=1000 + current_version(t))
            .withColumnRenamed("body", "text"),
        )
    ck = read_manifest(t, current_version(t))
    assert ck["column_mapping"]["map"] == {"text": "body"}


def test_restore_pins_mapping_across_rename_and_drop(spark, tmp_path):
    t = str(tmp_path / "rr")
    init_table(spark, t, _seed(spark, 20).coalesce(1))
    v0 = current_version(t)
    drop_column(t, "body")
    append(
        spark,
        t,
        spark.createDataFrame(
            [(700, 3, "readded")], ["doc_id", "grp", "body"]
        ),
    )  # body -> body#2
    restore(spark, t, v0)
    # restored state: original body column with original values
    snap = snapshot(spark, t)
    assert snap.columns == ["doc_id", "grp", "body"]
    assert snap.where("body = 'm-3'").count() == 1
    assert resolve_mapping(t) == {"map": {}, "retired": []}
    # a post-restore append writes the ORIGINAL physical column
    append(
        spark,
        t,
        spark.createDataFrame(
            [(800, 4, "post")], ["doc_id", "grp", "body"]
        ),
    )
    snap2 = snapshot(spark, t)
    assert snap2.where("body IS NULL").count() == 0
    assert snap2.where("body = 'post'").count() == 1


def test_clone_carries_the_mapping(spark, tmp_path):
    t = str(tmp_path / "cl_src")
    c = str(tmp_path / "cl_dst")
    init_table(spark, t, _seed(spark, 15).coalesce(1))
    rename_column(t, "body", "text")
    tx.clone_table(t, c)
    snap = snapshot(spark, c)
    assert snap.columns == ["doc_id", "grp", "text"]
    assert snap.where("text = 'm-3'").count() == 1
    # clone-local writes keep composing
    append(
        spark,
        c,
        spark.createDataFrame(
            [(900, 1, "clone-new")], ["doc_id", "grp", "text"]
        ),
    )
    assert snapshot(spark, c).count() == 16
    assert snapshot(spark, t).count() == 15  # source untouched


# ---------------- IDENTITY columns ----------------


def test_identity_dense_monotone_and_generated_always(spark, tmp_path):
    from etl_sentinel_imagery_spark.operators.txlog import (
        append_identity,
        enable_identity,
        resolve_identity,
    )

    t = str(tmp_path / "idt")
    init_table(spark, t, _seed(spark, 10).coalesce(1))
    enable_identity(t, "rid", start=100)
    append_identity(spark, t, _seed(spark, 5, offset=200).repartition(3))
    append_identity(spark, t, _seed(spark, 7, offset=300).repartition(2))
    assert resolve_identity(t) == {"rid": 112}
    snap = snapshot(spark, t)
    ids = sorted(
        r["rid"] for r in snap.where("rid IS NOT NULL").collect()
    )
    assert ids == list(range(100, 112))  # dense, collision-free
    # pre-identity rows NULL-fill (schema evolved at first assign)
    assert snap.where("rid IS NULL").count() == 10
    # GENERATED ALWAYS: writes must not supply the column
    with pytest.raises(ValueError, match="GENERATED ALWAYS"):
        append_identity(
            spark,
            t,
            _seed(spark, 2).withColumn("rid", F.lit(1).cast("long")),
        )
    with pytest.raises(ValueError, match="already exists"):
        enable_identity(t, "doc_id")
    with pytest.raises(ValueError, match="identity column"):
        rename_column(t, "rid", "rid2")
    with pytest.raises(ValueError, match="identity column"):
        drop_column(t, "rid")


def test_identity_never_reuses_across_restore_and_truncate(
    spark, tmp_path
):
    from etl_sentinel_imagery_spark.operators.txlog import (
        append_identity,
        enable_identity,
        resolve_identity,
    )

    t = str(tmp_path / "idr")
    init_table(spark, t, _seed(spark, 4).coalesce(1))
    enable_identity(t, "rid")
    v_pre = current_version(t)
    append_identity(spark, t, _seed(spark, 6, offset=50).coalesce(1))
    restore(spark, t, v_pre)  # rolls the ROWS back...
    assert snapshot(spark, t).count() == 4
    append_identity(spark, t, _seed(spark, 3, offset=80).coalesce(1))
    # ...but never the WATERMARK: the post-restore batch continues
    ids = sorted(
        r["rid"]
        for r in snapshot(spark, t).where("rid IS NOT NULL").collect()
    )
    assert ids == [6, 7, 8], f"ids reused after restore: {ids}"
    for i in range(5):
        append(spark, t, _seed(spark, 2, offset=900 + i * 10))
    truncate_history(t, keep_versions=2)
    assert resolve_identity(t) == {"rid": 9}
    append_identity(spark, t, _seed(spark, 2, offset=990).coalesce(1))
    ids2 = sorted(
        r["rid"]
        for r in snapshot(spark, t).where("rid IS NOT NULL").collect()
    )
    assert ids2 == [6, 7, 8, 9, 10]


def test_identity_conflict_loser_reassigns(spark, tmp_path):
    from etl_sentinel_imagery_spark.operators.txlog import (
        append_identity,
        enable_identity,
        vacuum,
    )

    t = str(tmp_path / "idc")
    init_table(spark, t, _seed(spark, 4).coalesce(1))
    enable_identity(t, "rid")

    class LoseOnce(tx.PosixLogStore):
        def __init__(self):
            self.lose = 1

        def claim(self, tmp_path, final_path):
            if self.lose > 0:
                self.lose -= 1
                return False
            return super().claim(tmp_path, final_path)

    tx.set_log_store(LoseOnce())
    try:
        with pytest.raises(tx.TxConflict):
            append_identity(
                spark, t, _seed(spark, 3, offset=40).coalesce(1)
            )
        # retry reassigns from the (unchanged) watermark and lands
        append_identity(spark, t, _seed(spark, 3, offset=40).coalesce(1))
    finally:
        tx.set_log_store(tx.PosixLogStore())
    ids = sorted(
        r["rid"]
        for r in snapshot(spark, t).where("rid IS NOT NULL").collect()
    )
    assert ids == [0, 1, 2]
    assert vacuum(t, min_age_seconds=0)  # the loser's files reclaim
    assert snapshot(spark, t).count() == 7


# ---------------- lock-free appends (auto-rebase) ----------------


class _InterleaveOnce(tx.PosixLogStore):
    """On the FIRST claim, run an interleaved commit (which takes the
    claimed version slot for real) and report the original claim as
    lost — a deterministic single-thread reproduction of a race."""

    def __init__(self, interleave):
        self.fired = False
        self.interleave = interleave

    def claim(self, tmp_path, final_path):
        if not self.fired:
            self.fired = True
            self.interleave()  # recursion lands via the fired branch
            return False
        return super().claim(tmp_path, final_path)


def test_append_rebases_over_concurrent_commits(spark, tmp_path):
    """A lost claim race auto-rebases: the caller never sees
    TxConflict, both commits land, no files rewrite."""
    t = str(tmp_path / "lf")
    init_table(spark, t, _seed(spark, 10).coalesce(1))

    tx.set_log_store(
        _InterleaveOnce(
            lambda: append(
                spark, t, _seed(spark, 5, offset=100).coalesce(1)
            )
        )
    )
    try:
        v = append(spark, t, _seed(spark, 3, offset=200).coalesce(1))
    finally:
        tx.set_log_store(tx.PosixLogStore())
    assert v == 2  # rebased onto the interleaved commit
    assert snapshot(spark, t).count() == 18
    ops = [h["op"] for h in tx.history(t)]
    assert ops == ["init", "append", "append"]


def test_append_rebase_reenforces_new_constraints(spark, tmp_path):
    """An append racing add_constraint must re-check the batch against
    the NEW constraint set — a violating batch raises instead of
    slipping in behind the constraint commit."""
    from etl_sentinel_imagery_spark.operators.txlog import (
        ConstraintViolation,
    )

    t = str(tmp_path / "lfc")
    init_table(spark, t, _seed(spark, 10).coalesce(1))

    tx.set_log_store(
        _InterleaveOnce(
            lambda: add_constraint(
                spark, t, "grp_small", "grp BETWEEN 0 AND 6"
            )
        )
    )
    bad = spark.createDataFrame(
        [(999, 99, "oob")], ["doc_id", "grp", "body"]
    )
    try:
        with pytest.raises(ConstraintViolation, match="grp_small"):
            append(spark, t, bad)
    finally:
        tx.set_log_store(tx.PosixLogStore())
    assert snapshot(spark, t).count() == 10  # nothing slipped in


def test_append_rebase_refuses_concurrent_rename(spark, tmp_path):
    """A concurrent RENAME changes the physical layout the staged
    files were written under — the rebase must surface TxConflict, not
    commit files whose physical names no longer match the mapping."""
    t = str(tmp_path / "lfr")
    init_table(spark, t, _seed(spark, 10).coalesce(1))

    tx.set_log_store(
        _InterleaveOnce(lambda: rename_column(t, "body", "text"))
    )
    try:
        with pytest.raises(tx.TxConflict):
            append(spark, t, _seed(spark, 3, offset=50).coalesce(1))
    finally:
        tx.set_log_store(tx.PosixLogStore())
    # retry under the new schema lands
    append(
        spark,
        t,
        _seed(spark, 3, offset=50)
        .withColumnRenamed("body", "text")
        .coalesce(1),
    )
    assert snapshot(spark, t).count() == 13
