"""Deletion vectors (merge-on-read) for the transaction log.

Acceptance contract (round-4 verdict #1): a DV delete equals the
copy-on-write delete row-for-row — through snapshot, time travel, AND
the change feed; compaction materializes the vectors; the
Bloom-targeted candidate set composes; claim-race safety is unchanged
(the race suite in test_txlog keeps covering that path — DV commits
go through the identical _commit_delta/_claim machinery).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from etl_sentinel_imagery_spark.operators.txlog import (
    _entry_dvs,
    _entry_name,
    append,
    compact,
    current_version,
    delete_rows,
    delete_rows_dv,
    dv_delete_candidates,
    init_table,
    optimize,
    read_manifest,
    resolve_files,
    snapshot,
    table_changes,
    vacuum,
)


def _seed(spark, n=100, offset=0):
    return spark.range(offset, offset + n).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 7).cast("int").alias("grp"),
        F.concat(F.lit("dv-"), F.col("id")).alias("body"),
    )


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_dv_delete_equals_rewrite_delete(spark, tmp_path):
    """The headline parity: same table, same delete — one via DV, one
    via rewrite — identical snapshots, time travel, and change feed."""
    t_dv, t_rw = str(tmp_path / "dv"), str(tmp_path / "rw")
    for t in (t_dv, t_rw):
        init_table(spark, t, _seed(spark, 300).repartition(6))
        append(spark, t, _seed(spark, 50, offset=1000).repartition(2))
    targets = [5, 123, 222, 1007]

    files_before = [_entry_name(e) for e in resolve_files(t_dv)]
    v_dv = delete_rows_dv(spark, t_dv, "doc_id", targets)
    v_rw = delete_rows(spark, t_rw, "doc_id", targets)

    # snapshots identical
    assert _rows(snapshot(spark, t_dv)) == _rows(snapshot(spark, t_rw))
    assert snapshot(spark, t_dv).count() == 346
    # time travel identical (pre-delete versions intact)
    assert _rows(snapshot(spark, t_dv, version=v_dv - 1)) == _rows(
        snapshot(spark, t_rw, version=v_rw - 1)
    )
    # NO data file was rewritten on the DV side: every pre-delete name
    # is still live (vs the rewrite side, which swapped files)
    files_after = [_entry_name(e) for e in resolve_files(t_dv)]
    assert files_after == files_before
    assert read_manifest(t_dv, v_dv)["op"] == "delete_dv"
    # the touched entries carry dv chains; untouched ones don't
    touched = [e for e in resolve_files(t_dv) if _entry_dvs(e)]
    assert 0 < len(touched) < len(files_after)

    # change feed identical: exactly the dropped rows, as deletes
    def feed(t, v):
        return sorted(
            map(
                tuple,
                table_changes(spark, t, v - 1, v)
                .select("doc_id", "grp", "body", "_change_type")
                .collect(),
            )
        )

    f_dv, f_rw = feed(t_dv, v_dv), feed(t_rw, v_rw)
    assert f_dv == f_rw
    assert len(f_dv) == 4 and all(r[-1] == "delete" for r in f_dv)


def test_dv_deletes_accumulate_and_never_double_record(spark, tmp_path):
    """Repeated DV deletes widen the chain; re-deleting an
    already-deleted key records nothing new (the probe reads
    DV-aware); a file whose every row dies becomes a pure remove."""
    t = str(tmp_path / "acc")
    init_table(spark, t, _seed(spark, 40).coalesce(1))
    append(spark, t, _seed(spark, 10, offset=500).coalesce(1))

    v1 = delete_rows_dv(spark, t, "doc_id", [1, 2])
    v2 = delete_rows_dv(spark, t, "doc_id", [2, 3])  # 2 already dead
    assert snapshot(spark, t).count() == 47
    (entry,) = [e for e in resolve_files(t) if _entry_dvs(e)]
    assert len(_entry_dvs(entry)) == 2 and entry["dv_n"] == 3
    # the v2 sidecar recorded ONLY doc 3 — not a re-delete of 2
    side2 = set(_entry_dvs(entry)) - set(
        _entry_dvs(
            [e for e in resolve_files(t, v1) if _entry_dvs(e)][0]
        )
    )
    dv2 = spark.read.parquet(os.path.join(t, side2.pop()))
    assert dv2.count() == 1
    # change feed of v2 is exactly doc 3
    f = table_changes(spark, t, v1, v2).select("doc_id", "_change_type")
    assert _rows(f) == [(3, "delete")]

    # kill the whole second file → pure remove, no dv entry survives
    delete_rows_dv(spark, t, "doc_id", list(range(500, 510)))
    names = [_entry_name(e) for e in resolve_files(t)]
    assert len(names) == 1
    assert snapshot(spark, t).count() == 37
    # nothing hit → no empty commit
    v_before = current_version(t)
    assert delete_rows_dv(spark, t, "doc_id", [999999]) == v_before


def test_compact_and_optimize_materialize_dvs(spark, tmp_path):
    t = str(tmp_path / "mat")
    init_table(spark, t, _seed(spark, 200).repartition(4))
    delete_rows_dv(spark, t, "doc_id", [7, 77, 177])
    want = _rows(snapshot(spark, t))
    compact(spark, t, target_files=2)
    assert all(not _entry_dvs(e) for e in resolve_files(t))
    assert _rows(snapshot(spark, t)) == want
    # another DV round, then OPTIMIZE also materializes
    delete_rows_dv(spark, t, "doc_id", [42])
    want2 = _rows(snapshot(spark, t))
    optimize(spark, t, target_files=2)
    assert all(not _entry_dvs(e) for e in resolve_files(t))
    assert _rows(snapshot(spark, t)) == want2


def test_dv_composes_with_rewrite_delete_and_partitions(spark, tmp_path):
    """DV then copy-on-write on the SAME table: the rewrite reads
    DV-aware (deleted rows stay dead through the rewrite), on a
    hive-partitioned table with manifest stats."""
    t = str(tmp_path / "mix")
    df = spark.range(120).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 3).cast("int").alias("par"),
        F.concat(F.lit("m-"), F.col("id")).alias("body"),
    )
    init_table(
        spark, t, df, stat_cols=["doc_id"], partition_cols=["par"]
    )
    delete_rows_dv(spark, t, "doc_id", [0, 30, 60])
    assert snapshot(spark, t).count() == 117
    # partition columns come back through the DV-filtered read
    assert set(snapshot(spark, t).columns) == {"doc_id", "par", "body"}
    delete_rows(spark, t, "doc_id", [3, 33])  # rewrite form
    snap = snapshot(spark, t)
    assert snap.count() == 115
    dead = [0, 30, 60, 3, 33]
    assert snap.filter(F.col("doc_id").isin(dead)).count() == 0
    # rewritten files dropped their dv where they were rewritten;
    # the files the rewrite never touched keep theirs
    for e in resolve_files(t):
        name = _entry_name(e)
        assert "par=" in name
    # stats survive on DV entries → snapshot_pruned still prunes
    from etl_sentinel_imagery_spark.operators.txlog import snapshot_pruned

    pruned, st = snapshot_pruned(spark, t, "doc_id", lo=100)
    assert st["files_skipped"] > 0
    assert _rows(pruned) == _rows(snap.filter("doc_id >= 100"))


def test_incremental_agg_delta_tracks_dv_deletes(spark, tmp_path):
    """The MV refresh sees a DV delete as a content change even though
    no file NAME changed: old_mv ⊎ delta == full recompute."""
    from etl_sentinel_imagery_spark.operators.txlog import (
        incremental_agg_delta,
    )

    t = str(tmp_path / "mv")
    init_table(spark, t, _seed(spark, 210).repartition(3))
    v0 = current_version(t)
    full0 = {
        r["grp"]: (r["n"], r["s"])
        for r in snapshot(spark, t)
        .groupBy("grp")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("doc_id").alias("s"))
        .collect()
    }
    append(spark, t, _seed(spark, 30, offset=700))
    v2 = delete_rows_dv(spark, t, "doc_id", [0, 7, 14, 701])
    delta = {
        r["grp"]: (r["n"], r["sum_doc_id"])
        for r in incremental_agg_delta(
            spark, t, v0, v2, ["grp"], sum_cols=["doc_id"]
        ).collect()
    }
    full2 = {
        r["grp"]: (r["n"], r["s"])
        for r in snapshot(spark, t)
        .groupBy("grp")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("doc_id").alias("s"))
        .collect()
    }
    merged = {
        g: (
            full0.get(g, (0, 0))[0] + delta.get(g, (0, 0))[0],
            (full0.get(g, (0, 0))[1] or 0) + (delta.get(g, (0, 0))[1] or 0),
        )
        for g in set(full0) | set(delta)
    }
    merged = {g: v for g, v in merged.items() if v[0] != 0}
    assert merged == full2


def test_bloom_candidates_compose(spark, tmp_path):
    """dv_delete_candidates narrows the probe scan via the per-file
    Bloom sidecar — no false negatives, so the candidate-restricted
    delete equals the full-probe delete."""
    from etl_sentinel_imagery_spark.operators.skipping import (
        build_file_bloom_index,
    )

    t = str(tmp_path / "bl")
    init_table(spark, t, _seed(spark, 400).repartition(8))
    build_file_bloom_index(spark, t, "doc_id")
    cands = dv_delete_candidates(spark, t, "doc_id", [17, 305])
    live = [_entry_name(e) for e in resolve_files(t)]
    assert set(cands) <= set(live)
    # the index prunes at least something at 8 files / 2 keys
    assert len(cands) < len(live)
    delete_rows_dv(spark, t, "doc_id", [17, 305], candidate_names=cands)
    snap = snapshot(spark, t)
    assert snap.count() == 398
    assert snap.filter(F.col("doc_id").isin([17, 305])).count() == 0
    # appended-after-index files are never silently skipped
    append(spark, t, _seed(spark, 5, offset=900).coalesce(1))
    cands2 = dv_delete_candidates(spark, t, "doc_id", [902])
    delete_rows_dv(spark, t, "doc_id", [902], candidate_names=cands2)
    assert snapshot(spark, t).filter("doc_id = 902").count() == 0


def test_vacuum_reclaims_orphan_dv_sidecars(spark, tmp_path):
    t = str(tmp_path / "vdv")
    init_table(spark, t, _seed(spark, 50).coalesce(1))
    delete_rows_dv(spark, t, "doc_id", [1])
    # a crashed/conflicted DV writer's sidecar: on disk, never committed
    orphan = os.path.join(t, "_dv", "dv-orphan")
    os.makedirs(orphan)
    with open(os.path.join(orphan, "junk.parquet"), "wb") as f:
        f.write(b"junk")
    removed = vacuum(t, min_age_seconds=0)
    assert removed == [os.path.join("_dv", "dv-orphan")]
    assert not os.path.exists(orphan)
    # the referenced sidecar survives and the table still reads
    assert snapshot(spark, t).count() == 49
    # age gate applies to sidecars too
    orphan2 = os.path.join(t, "_dv", "dv-orphan2")
    os.makedirs(orphan2)
    assert vacuum(t, min_age_seconds=3600) == []
    assert vacuum(t, min_age_seconds=0) == [os.path.join("_dv", "dv-orphan2")]


def test_dv_conflict_loser_retries_cleanly(spark, tmp_path):
    """A DV delete that loses the claim race now absorbs it LOCK-FREE
    (the rebase loop retries inside the call — append's contract since
    round 6); the staged sidecar is reused, nothing orphans."""
    from etl_sentinel_imagery_spark.operators import txlog as tx

    t = str(tmp_path / "race")
    init_table(spark, t, _seed(spark, 60).coalesce(1))
    v0 = tx.current_version(t)

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
        assert delete_rows_dv(spark, t, "doc_id", [9]) == v0 + 1
        assert snapshot(spark, t).count() == 59
    finally:
        tx.set_log_store(tx.PosixLogStore())
    # the rebase reused its staged sidecar: exactly one, referenced
    assert len(os.listdir(os.path.join(t, "_dv"))) == 1
    assert vacuum(t, min_age_seconds=0) == []
    assert snapshot(spark, t).count() == 59


def test_merge_upsert_one_commit(spark, tmp_path):
    """MERGE INTO: matched keys update via DV, unmatched insert, the
    rest untouched — all in ONE commit (no delete-landed/insert-missing
    window), with the change feed showing the delete+insert pair."""
    t = str(tmp_path / "merge")
    init_table(spark, t, _seed(spark, 50).repartition(3))
    v0 = current_version(t)
    from etl_sentinel_imagery_spark.operators.txlog import (
        history,
        merge_upsert,
    )

    n_hist = len(history(t))
    src = spark.createDataFrame(
        [(7, 99, "updated-7"), (23, 99, "updated-23"), (500, 99, "new-500")],
        ["doc_id", "grp", "body"],
    )
    v = merge_upsert(spark, t, src, "doc_id")
    assert v == v0 + 1  # exactly one commit
    assert len(history(t)) == n_hist + 1
    assert history(t)[-1]["op"] == "merge"

    snap = snapshot(spark, t)
    assert snap.count() == 51  # 50 + 1 inserted
    rows = {r["doc_id"]: (r["grp"], r["body"]) for r in snap.collect()}
    assert rows[7] == (99, "updated-7")
    assert rows[23] == (99, "updated-23")
    assert rows[500] == (99, "new-500")
    assert rows[8] == (1, "dv-8")  # untouched row intact
    # no data file was rewritten for the updates: old names still live
    assert any(_entry_dvs(e) for e in resolve_files(t))
    # time travel: the parent still shows the pre-images
    old = {r["doc_id"]: r["body"] for r in snapshot(spark, t, v0).collect()}
    assert old[7] == "dv-7" and 500 not in old
    # change feed: delete of the 2 pre-images + insert of the 3 source rows
    feed = table_changes(spark, t, v0, v).select(
        "doc_id", "_change_type"
    )
    got = sorted(map(tuple, feed.collect()))
    assert got == [
        (7, "delete"), (7, "insert"),
        (23, "delete"), (23, "insert"),
        (500, "insert"),
    ]


def test_merge_upsert_schema_evolution_and_partitions(spark, tmp_path):
    t = str(tmp_path / "mep")
    df = spark.range(40).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 2).cast("int").alias("par"),
        F.concat(F.lit("b-"), F.col("id")).alias("body"),
    )
    init_table(spark, t, df, partition_cols=["par"])
    from etl_sentinel_imagery_spark.operators.txlog import merge_upsert

    src = spark.createDataFrame(
        [(4, 0, "upd-4", "crawl"), (900, 1, "new-900", "synth")],
        ["doc_id", "par", "body", "source"],  # add-column evolution
    )
    merge_upsert(spark, t, src, "doc_id")
    snap = snapshot(spark, t)
    assert snap.count() == 41
    assert set(snap.columns) == {"doc_id", "par", "body", "source"}
    rows = {r["doc_id"]: (r["body"], r["source"]) for r in snap.collect()}
    assert rows[4] == ("upd-4", "crawl")
    assert rows[900] == ("new-900", "synth")
    assert rows[5] == ("b-5", None)  # untouched, NULL-filled

    # key-duplicate source refuses
    import pytest as _pytest

    dup = spark.createDataFrame(
        [(1, 0, "a", "x"), (1, 0, "b", "y")],
        ["doc_id", "par", "body", "source"],
    )
    with _pytest.raises(ValueError, match="key-unique"):
        merge_upsert(spark, t, dup, "doc_id")

    # insert-only and update-only degenerate cases
    merge_upsert(
        spark,
        t,
        spark.createDataFrame(
            [(901, 1, "n", "s")], ["doc_id", "par", "body", "source"]
        ),
        "doc_id",
    )
    assert snapshot(spark, t).count() == 42
    merge_upsert(
        spark,
        t,
        spark.createDataFrame(
            [(901, 1, "n2", "s2")], ["doc_id", "par", "body", "source"]
        ),
        "doc_id",
    )
    snap2 = snapshot(spark, t)
    assert snap2.count() == 42
    assert snap2.filter("doc_id = 901").first()["body"] == "n2"


def test_dv_read_plan_shape(spark, tmp_path):
    """Physical-plan contract of the DV read path: a DV-free snapshot
    plans IDENTICALLY to a plain parquet read (zero added nodes — the
    fast path really is free), and a DV-carrying snapshot anti-joins
    with a real join strategy (broadcast/shuffled hash/sort-merge),
    never a BroadcastNestedLoopJoin, with the filter still pushed to
    the scan."""
    t = str(tmp_path / "plan")
    init_table(spark, t, _seed(spark, 200).repartition(4))

    clean = snapshot(spark, t).filter(F.col("doc_id") > 50)
    plan_clean = clean._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan_clean
    assert "PushedFilters" in plan_clean
    assert "GreaterThan(doc_id,50" in plan_clean

    delete_rows_dv(spark, t, "doc_id", [60, 70])
    dvd = snapshot(spark, t).filter(F.col("doc_id") > 50)
    plan_dv = dvd._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan_dv
    assert "LeftAnti" in plan_dv
    # the user predicate still reaches the parquet scan under the DV join
    assert "PushedFilters" in plan_dv and "GreaterThan(doc_id,50" in plan_dv
    assert dvd.count() == 147  # 149 in range minus the 2 deleted


def test_restore_rolls_back_as_a_commit(spark, tmp_path):
    """RESTORE: an older snapshot becomes current via a new commit —
    history is preserved (a restore undoes by another restore), no
    data copies, and the restored schema narrows back across an
    evolution."""
    from etl_sentinel_imagery_spark.operators.txlog import history, restore

    t = str(tmp_path / "rst")
    init_table(spark, t, _seed(spark, 30))
    v0 = current_version(t)
    append(
        spark,
        t,
        _seed(spark, 10, offset=100).withColumn("extra", F.lit("x")),
    )
    delete_rows_dv(spark, t, "doc_id", [5])
    v2 = current_version(t)
    want_v0 = sorted(map(tuple, snapshot(spark, t, v0).collect()))

    v3 = restore(spark, t, v0)
    assert v3 == v2 + 1
    assert history(t)[-1]["op"] == f"restore_to_{v0}"
    snap = snapshot(spark, t)
    assert sorted(map(tuple, snap.collect())) == want_v0
    assert "extra" not in snap.columns  # schema narrowed back
    # the rolled-back versions still time-travel
    assert snapshot(spark, t, v2).count() == 39
    # restore of the restore: forward again
    restore(spark, t, v2)
    assert snapshot(spark, t).count() == 39
    assert "extra" in snapshot(spark, t).columns
    # no-op restore returns current
    assert restore(spark, t, current_version(t)) == current_version(t)
    # the change feed of the restore-to-v0 commit: it dropped the 10
    # appended rows and RESURRECTED doc 5 (the v0 entry without its DV)
    feed = table_changes(spark, t, v3 - 1, v3)
    del_ids = {
        r["doc_id"]
        for r in feed.filter("_change_type = 'delete'")
        .select("doc_id")
        .collect()
    }
    ins_ids = {
        r["doc_id"]
        for r in feed.filter("_change_type = 'insert'")
        .select("doc_id")
        .collect()
    }
    assert del_ids == set(range(100, 110))
    assert ins_ids == {5}


def test_shallow_clone_zero_copy_branch(spark, tmp_path):
    """CLONE: metadata-only branch over the source's files; clone
    writes/deletes diverge without touching the source; partitioned
    sources refuse."""
    import glob

    from etl_sentinel_imagery_spark.operators.txlog import clone_table

    src = str(tmp_path / "src")
    cl = str(tmp_path / "clone")
    init_table(spark, src, _seed(spark, 60).repartition(3))
    delete_rows_dv(spark, src, "doc_id", [10])  # source DV rides along
    clone_table(src, cl)
    # zero data files under the clone dir
    assert glob.glob(os.path.join(cl, "**", "*.parquet"), recursive=True) == []
    got = sorted(map(tuple, snapshot(spark, cl).collect()))
    assert got == sorted(map(tuple, snapshot(spark, src).collect()))
    assert len(got) == 59  # the source DV applies in the clone

    # clone-local delete + append: the source must not move
    src_v = current_version(src)
    delete_rows_dv(spark, cl, "doc_id", [3, 4])
    append(spark, cl, _seed(spark, 5, offset=900))
    assert current_version(src) == src_v
    assert snapshot(spark, src).count() == 59
    assert snapshot(spark, cl).count() == 62
    # the clone's DV sidecar lives under the CLONE; the source's _dv
    # still holds exactly its own one sidecar
    assert len(os.listdir(os.path.join(cl, "_dv"))) == 1
    assert len(os.listdir(os.path.join(src, "_dv"))) == 1
    # source keeps evolving independently; the clone is pinned
    append(spark, src, _seed(spark, 10, offset=500))
    assert snapshot(spark, cl).count() == 62

    # compaction materializes the clone fully into its own dir
    compact(spark, cl, target_files=2)
    assert snapshot(spark, cl).count() == 62
    assert (
        len(glob.glob(os.path.join(cl, "*.parquet"))) >= 1
    )

    # partitioned source refuses
    p = str(tmp_path / "p")
    init_table(
        spark,
        p,
        _seed(spark, 10).withColumn(
            "par", (F.col("doc_id") % 2).cast("int")
        ),
        partition_cols=["par"],
    )
    with pytest.raises(ValueError, match="partitioned"):
        clone_table(p, str(tmp_path / "pc"))


def test_stats_auto_prune_the_dv_and_merge_probes(spark, tmp_path):
    """With manifest stats on the key column, DV deletes and merges
    probe only the files whose [min, max] intersects the key range —
    exact (files without stats always probed), and the results equal
    the unpruned form."""
    from etl_sentinel_imagery_spark.operators.txlog import (
        _stats_probe_subset,
        merge_upsert,
        optimize,
    )

    t = str(tmp_path / "sp")
    init_table(
        spark,
        t,
        _seed(spark, 400).repartition(8),
        stat_cols=["doc_id"],
    )
    optimize(spark, t, zorder_by=["doc_id"], target_files=8)
    entries = resolve_files(t)
    # the probe subset for a narrow range really is a subset
    probe = _stats_probe_subset(entries, "doc_id", 10, 20)
    assert 0 < len(probe) < len(entries)
    # entries without stats are always kept
    bare = [{"name": "x.parquet"}]
    assert _stats_probe_subset(bare, "doc_id", 0, 1) == bare

    delete_rows_dv(spark, t, "doc_id", [12, 15])
    snap = snapshot(spark, t)
    assert snap.count() == 398
    assert snap.filter(F.col("doc_id").isin([12, 15])).count() == 0

    src = spark.createDataFrame(
        [(17, 0, "upd"), (1000, 0, "new")], ["doc_id", "grp", "body"]
    )
    merge_upsert(spark, t, src, "doc_id")
    snap2 = snapshot(spark, t)
    assert snap2.count() == 399
    assert snap2.filter("doc_id = 17").first()["body"] == "upd"
    assert snap2.filter("doc_id = 1000").count() == 1
    # untouched rows outside the pruned range are intact
    assert snap2.filter("doc_id = 399").first()["body"] == "dv-399"


def test_table_details_metadata_only(spark, tmp_path):
    from etl_sentinel_imagery_spark.operators.txlog import table_details

    t = str(tmp_path / "det")
    init_table(spark, t, _seed(spark, 60).repartition(3), stat_cols=["doc_id"])
    delete_rows_dv(spark, t, "doc_id", [1, 2, 3])
    d = table_details(t)
    assert d["n_files"] == 3
    assert d["n_dv_files"] >= 1
    assert d["dv_dead_rows"] == 3
    assert d["n_columns"] == 3
    assert d["stat_cols"] == ["doc_id"]
    assert d["history_ops"][-1] == "delete_dv"
    # the compaction signal clears after optimize
    optimize(spark, t, target_files=2)
    d2 = table_details(t)
    assert d2["dv_dead_rows"] == 0 and d2["n_dv_files"] == 0
    # historical versions answer their own state
    assert table_details(t, version=0)["n_files"] == 3
    assert table_details(t, version=0)["dv_dead_rows"] == 0


def test_compact_dvs_folds_chains(spark, tmp_path):
    """Five deletes on one file build a 5-sidecar chain; compact_dvs
    folds it to ONE without touching data files, snapshots and time
    travel are unchanged, the change feed skips the fold as
    content-neutral, and short chains are left alone."""
    from etl_sentinel_imagery_spark.operators.txlog import (
        compact_dvs,
        history,
    )

    t = str(tmp_path / "fold")
    init_table(spark, t, _seed(spark, 40).coalesce(1))
    for k in range(5):
        delete_rows_dv(spark, t, "doc_id", [k])
    (entry,) = resolve_files(t)
    assert len(_entry_dvs(entry)) == 5
    files_before = [_entry_name(e) for e in resolve_files(t)]
    want = sorted(map(tuple, snapshot(spark, t).collect()))
    v_pre = current_version(t)

    v = compact_dvs(spark, t, max_chain=4)
    assert v == v_pre + 1 and history(t)[-1]["op"] == "compact_dv"
    (entry2,) = resolve_files(t)
    assert len(_entry_dvs(entry2)) == 1
    assert entry2["dv_n"] == 5
    assert [_entry_name(e) for e in resolve_files(t)] == files_before
    assert sorted(map(tuple, snapshot(spark, t).collect())) == want
    assert snapshot(spark, t).count() == 35
    # time travel to the pre-fold version still reads the old chain
    assert sorted(map(tuple, snapshot(spark, t, v_pre).collect())) == want
    # content-neutral: the feed skips it
    assert table_changes(spark, t, v_pre, v).count() == 0
    # further deletes chain onto the folded sidecar
    delete_rows_dv(spark, t, "doc_id", [30])
    assert snapshot(spark, t).count() == 34
    # below the bound → no-op
    assert compact_dvs(spark, t, max_chain=4) == current_version(t)


def test_bloom_fallback_is_automatic_without_stats(spark, tmp_path):
    """A table with NO manifest stats but a Bloom sidecar: the DV
    delete uses the index automatically (point keys are its case);
    with neither index nor stats it still deletes correctly."""
    from etl_sentinel_imagery_spark.operators.skipping import (
        build_file_bloom_index,
    )

    t = str(tmp_path / "auto")
    init_table(spark, t, _seed(spark, 200).repartition(8))  # no stat_cols
    build_file_bloom_index(spark, t, "doc_id")
    delete_rows_dv(spark, t, "doc_id", [9, 111])
    snap = snapshot(spark, t)
    assert snap.count() == 198
    assert snap.filter(F.col("doc_id").isin([9, 111])).count() == 0
    # appended-after-index rows are never missed (unindexed files are
    # always candidates)
    append(spark, t, _seed(spark, 10, offset=800).coalesce(1))
    delete_rows_dv(spark, t, "doc_id", [803])
    assert snapshot(spark, t).filter("doc_id = 803").count() == 0
    assert snapshot(spark, t).count() == 207
    # no index, no stats: plain full probe still correct
    t2 = str(tmp_path / "plain")
    init_table(spark, t2, _seed(spark, 30))
    delete_rows_dv(spark, t2, "doc_id", [1])
    assert snapshot(spark, t2).count() == 29


def test_concurrent_dv_deletes_and_merge_with_retry(spark, tmp_path):
    """Op-level concurrency for the new verbs: threads race
    delete_rows_dv and merge_upsert on one table with
    caller-side retry-on-TxConflict (the documented contract); every
    op must land exactly once and the final state equals the
    sequential result. Loser sidecars become vacuumable orphans."""
    import threading

    from etl_sentinel_imagery_spark.operators import txlog as tx
    from etl_sentinel_imagery_spark.operators.txlog import merge_upsert

    t = str(tmp_path / "race_ops")
    init_table(spark, t, _seed(spark, 120).repartition(4))

    errors = []
    barrier = threading.Barrier(3)

    def with_retry(fn):
        barrier.wait()
        for _ in range(10):
            try:
                fn()
                return
            except tx.TxConflict:
                continue
        errors.append("retries exhausted")

    ops = [
        lambda: delete_rows_dv(spark, t, "doc_id", [5, 15]),
        lambda: delete_rows_dv(spark, t, "doc_id", [25, 35]),
        lambda: merge_upsert(
            spark,
            t,
            spark.createDataFrame(
                [(45, 99, "m"), (500, 99, "m")], ["doc_id", "grp", "body"]
            ),
            "doc_id",
        ),
    ]
    threads = [
        threading.Thread(target=with_retry, args=(op,)) for op in ops
    ]
    for th in threads:
        th.start()
    for th in threads:
        th.join(timeout=180)
    assert not errors
    snap = snapshot(spark, t)
    assert snap.count() == 120 - 4 + 1
    assert snap.filter(
        F.col("doc_id").isin([5, 15, 25, 35])
    ).count() == 0
    assert snap.filter("doc_id = 45").first()["grp"] == 99
    assert snap.filter("doc_id = 500").count() == 1
    # gapless history: init + exactly three op commits
    from etl_sentinel_imagery_spark.operators.txlog import history

    assert len(history(t)) == 4
    # any abandoned loser sidecars vacuum away; live state unaffected
    vacuum(t, min_age_seconds=0)
    assert snapshot(spark, t).count() == 117


def test_check_constraints_enforced_on_every_write_path(spark, tmp_path):
    """ADD CONSTRAINT: recorded in the manifest chain, enforced on
    append / merge / apply_changes with the offending constraint
    named; adding a constraint existing data violates refuses;
    dropping re-admits; the metadata commit is pure delta."""
    from etl_sentinel_imagery_spark.operators.txlog import (
        ConstraintViolation,
        add_constraint,
        apply_changes,
        drop_constraint,
        history,
        merge_upsert,
        resolve_constraints,
    )

    t = str(tmp_path / "cons")
    init_table(spark, t, _seed(spark, 30))
    add_constraint(spark, t, "grp_bounded", "grp BETWEEN 0 AND 6")
    add_constraint(spark, t, "body_present", "body IS NOT NULL")
    assert set(resolve_constraints(t)) == {"grp_bounded", "body_present"}
    assert history(t)[-1]["op"] == "add_constraint_body_present"

    ok = spark.createDataFrame(
        [(100, 3, "fine")], ["doc_id", "grp", "body"]
    )
    append(spark, t, ok)
    bad = spark.createDataFrame(
        [(101, 99, "oob")], ["doc_id", "grp", "body"]
    )
    with pytest.raises(ConstraintViolation, match="grp_bounded"):
        append(spark, t, bad)
    with pytest.raises(ConstraintViolation, match="grp_bounded"):
        merge_upsert(spark, t, bad, "doc_id")
    # NULL predicate result counts as a violation (ANSI CHECK says
    # NULL passes; we are stricter and the error names the constraint)
    nullish = spark.createDataFrame(
        [(102, None, "x")], "doc_id bigint, grp int, body string"
    )
    with pytest.raises(ConstraintViolation, match="grp_bounded"):
        append(spark, t, nullish)
    # apply_changes enforces on the upsert leg
    feed = bad.select(
        "*",
        F.lit("insert").alias("_change_type"),
        F.lit(1).alias("_commit_version"),
        F.lit("append").alias("_commit_op"),
    )
    with pytest.raises(ConstraintViolation, match="grp_bounded"):
        apply_changes(spark, t, feed, "doc_id")
    # nothing committed by any failed write
    assert snapshot(spark, t).count() == 31

    # pre-existing violations refuse the constraint itself
    with pytest.raises(ConstraintViolation, match="never"):
        add_constraint(spark, t, "never", "doc_id < 0")
    # drop re-admits
    drop_constraint(t, "grp_bounded")
    append(spark, t, bad)
    assert snapshot(spark, t).count() == 32
    # constraints survive unrelated commits via the chain walk
    delete_rows_dv(spark, t, "doc_id", [100])
    assert set(resolve_constraints(t)) == {"body_present"}


def test_cdf_of_restore_across_evolution_keeps_evolved_values(
    spark, tmp_path
):
    """Regression for the hypothesis-found counterexample
    [append_wide, restore]: the restore commit removes a file written
    under the WIDE schema while pinning the narrow target schema —
    its delete rows must still carry the evolved column's values
    (read under the PARENT's schema), or the feed's insert/delete
    pairs stop cancelling and any CDF fold diverges."""
    from etl_sentinel_imagery_spark.operators.txlog import restore

    t = str(tmp_path / "rx")
    init_table(
        spark,
        t,
        spark.createDataFrame([(1, "a"), (2, "b")], ["doc_id", "val"]),
    )
    append(
        spark,
        t,
        spark.createDataFrame(
            [(10, "c", "w0")], ["doc_id", "val", "w"]
        ),
    )  # add-column evolution
    v_rst = restore(spark, t, 0)  # narrows back

    feed = table_changes(spark, t, -1)
    rows = {
        (r["doc_id"], r["_change_type"]): r["w"] for r in feed.collect()
    }
    # the wide row's delete carries w='w0', exactly like its insert
    assert rows[(10, "insert")] == "w0"
    assert rows[(10, "delete")] == "w0"
    # and the fold nets to the narrow final state
    sign = F.when(F.col("_change_type") == "insert", 1).otherwise(-1)
    net = {
        (r["doc_id"], r["val"], r["w"]): r["n"]
        for r in feed.groupBy("doc_id", "val", "w")
        .agg(F.sum(sign).alias("n"))
        .collect()
        if r["n"] != 0
    }
    assert net == {(1, "a", None): 1, (2, "b", None): 1}
    assert snapshot(spark, t, v_rst).count() == 2


def test_bloom_candidates_resolve_at_pinned_version(spark, tmp_path):
    """Round-6 advice (medium): the Bloom candidate probe must
    resolve live files at the WRITER'S PINNED parent, not the current
    head — a concurrent rewrite landing between the pin and the probe
    would otherwise rename matching files out of the writer's
    by_name map, the intersection silently drops them, and the
    disjoint-touched-set rebase lets the delete skip those rows."""
    from etl_sentinel_imagery_spark.operators.skipping import (
        build_file_bloom_index,
    )
    from etl_sentinel_imagery_spark.operators.txlog import (
        _probe_candidates,
    )

    t = str(tmp_path / "pin")
    init_table(spark, t, _seed(spark, 200).repartition(4))
    build_file_bloom_index(spark, t, "doc_id")
    v1 = current_version(t)
    old_names = {_entry_name(e) for e in resolve_files(t, v1)}
    compact(spark, t)  # the concurrent rewrite: all names change
    new_names = {_entry_name(e) for e in resolve_files(t)}
    assert old_names.isdisjoint(new_names)
    # version-pinned resolution returns names of THAT version
    cands_pinned = dv_delete_candidates(
        spark, t, "doc_id", [17], version=v1
    )
    assert set(cands_pinned) <= old_names and cands_pinned
    cands_head = dv_delete_candidates(spark, t, "doc_id", [17])
    assert set(cands_head) <= new_names
    # the ladder's belt-and-braces guard: if resolution skew DOES
    # surface (candidates name files outside the caller's by_name),
    # fall back to the full probe instead of silently narrowing
    m = read_manifest(t, v1)
    entries_v1 = resolve_files(t, v1)
    by_name_v1 = {_entry_name(e): e for e in entries_v1}
    probe = _probe_candidates(
        spark, t, m, entries_v1, by_name_v1, "doc_id",
        None, None, values=[17],  # no version: resolves at head
    )
    assert probe == entries_v1  # full fallback, never a wrong subset
    # end-to-end: a delete pinned pre-compaction still kills the rows
    delete_rows_dv(spark, t, "doc_id", [17])
    assert snapshot(spark, t).filter("doc_id = 17").count() == 0


def test_delete_bounds_tolerate_null_keys(spark, tmp_path):
    """Round-6 advice (low): a None in a list-valued key set must not
    raise on the stats-bounds min/max — isin semantics are defined
    (None never matches) and both delete forms keep them."""
    t = str(tmp_path / "nulls")
    init_table(
        spark,
        t,
        _seed(spark, 60).coalesce(1),
        stat_cols=["doc_id"],
    )
    v = delete_rows_dv(spark, t, "doc_id", [None, 5, 7])
    assert v > 0
    snap = snapshot(spark, t)
    assert snap.count() == 58
    assert snap.filter(F.col("doc_id").isin([5, 7])).count() == 0
    v2 = delete_rows(spark, t, "doc_id", [None, 11])
    assert v2 > v
    assert snapshot(spark, t).count() == 57
    # all-None degenerates to a no-op, not a crash
    assert delete_rows_dv(spark, t, "doc_id", [None]) == v2
