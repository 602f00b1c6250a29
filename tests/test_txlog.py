"""Transaction log: snapshot isolation, atomic swaps (no transient
duplicates), optimistic-concurrency conflicts, time travel, vacuum."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from etl_sentinel_imagery_spark.operators import txlog as tx
from etl_sentinel_imagery_spark.operators.txlog import (
    TxConflict,
    _commit,
    append,
    resolve_files,
    compact,
    current_version,
    delete_rows,
    history,
    init_table,
    read_manifest,
    snapshot,
    vacuum,
)


def _seed(spark, n=100, offset=0):
    return spark.range(offset, offset + n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("v-"), F.col("id")).alias("body"),
    )


def test_append_snapshot_history_and_time_travel(spark, tmp_path):
    t = str(tmp_path / "t")
    init_table(spark, t, _seed(spark, 100))
    assert current_version(t) == 0
    assert snapshot(spark, t).count() == 100
    v1 = append(spark, t, _seed(spark, 50, offset=1000))
    assert v1 == 1 and snapshot(spark, t).count() == 150
    # time travel: version 0 still answers exactly the old rows
    assert snapshot(spark, t, version=0).count() == 100
    ops = [h["op"] for h in history(t)]
    assert ops == ["init", "append"]


def test_delete_is_atomic_for_pinned_readers(spark, tmp_path):
    """A reader pinned to the pre-delete version sees every original
    row AFTER the delete commits — and the new version sees no trace of
    the deleted keys. No intermediate state is observable: the file
    list changes in one manifest flip."""
    t = str(tmp_path / "d")
    init_table(
        spark, t, _seed(spark, 300).repartition(6)
    )
    pinned = current_version(t)
    files_before = {tx._entry_name(e) for e in resolve_files(t, pinned)}
    targets = [5, 123, 222]
    v = delete_rows(spark, t, "doc_id", targets)
    # new snapshot: keys gone, everything else intact
    after = snapshot(spark, t)
    assert after.count() == 297
    assert after.filter(F.col("doc_id").isin(targets)).count() == 0
    # pinned snapshot: still the FULL original (old files still on disk)
    old = snapshot(spark, t, version=pinned)
    assert old.count() == 300
    assert old.filter(F.col("doc_id").isin(targets)).count() == 3
    # untouched files carry over (and aren't even named in the delta)
    files_after = {tx._entry_name(e) for e in resolve_files(t, v)}
    assert files_before & files_after, "untouched files must carry over"
    delta = read_manifest(t, v)
    assert "files" not in delta  # a true delta manifest
    assert len(delta["removes"]) + len(delta["adds"]) < len(files_before)
    # a file whose every row matched drops out entirely
    t2 = str(tmp_path / "d2")
    init_table(spark, t2, _seed(spark, 10).coalesce(1))
    append(spark, t2, _seed(spark, 10, offset=500).coalesce(1))
    delete_rows(spark, t2, "doc_id", list(range(10)))
    assert len(resolve_files(t2)) == 1  # the fully-matched file vanished
    assert snapshot(spark, t2).count() == 10


def test_conflict_detection(spark, tmp_path):
    t = str(tmp_path / "c")
    init_table(spark, t, _seed(spark, 20))
    parent = current_version(t)
    append(spark, t, _seed(spark, 5, offset=100))  # someone else commits
    with pytest.raises(TxConflict):
        _commit(t, parent, resolve_files(t, parent), "stale")
    # double-init is also a conflict
    with pytest.raises(TxConflict):
        init_table(spark, t, _seed(spark, 1))


def test_compact_swaps_in_one_commit_and_vacuum(spark, tmp_path):
    t = str(tmp_path / "k")
    init_table(spark, t, _seed(spark, 200).repartition(8))
    assert len(resolve_files(t)) == 8
    v = compact(spark, t, target_files=1)
    assert len(resolve_files(t, v)) == 1
    assert read_manifest(t, v)["op"] == "compact"
    assert snapshot(spark, t).count() == 200
    # history intact: the pre-compaction version still reads
    assert snapshot(spark, t, version=v - 1).count() == 200
    # orphan simulation: a crashed writer's data file gets vacuumed,
    # referenced files (incl. historical) survive
    orphan = os.path.join(t, "part-orphan.parquet")
    with open(orphan, "wb") as f:
        f.write(b"junk")
    removed = vacuum(t, min_age_seconds=0)
    assert removed == ["part-orphan.parquet"]
    assert snapshot(spark, t, version=v - 1).count() == 200
    assert snapshot(spark, t).count() == 200


def test_empty_table_refuses_schemaless_snapshot(spark, tmp_path):
    t = str(tmp_path / "e")
    init_table(spark, t)
    with pytest.raises(ValueError, match="empty"):
        snapshot(spark, t)
    append(spark, t, _seed(spark, 3))
    assert snapshot(spark, t).count() == 3


def test_manifest_stats_prune_files_exactly(spark, tmp_path):
    """Iceberg-style manifest min/max: a range query reads only the
    files whose stats intersect, and the pruned result equals the
    full-scan filter exactly — across init, append, and delete."""
    from etl_sentinel_imagery_spark.operators.txlog import snapshot_pruned

    t = str(tmp_path / "stats")
    ranged = _seed(spark, 1000).repartitionByRange(5, F.col("doc_id"))
    init_table(spark, t, ranged, stat_cols=["doc_id"])
    m = read_manifest(t)
    assert m["stat_cols"] == ["doc_id"]
    assert all(isinstance(e, dict) and "stats" in e for e in m["files"])

    df, st = snapshot_pruned(spark, t, "doc_id", lo=100, hi=150)
    assert st["files_skipped"] >= 3  # disjoint ranges -> most files skip
    want = sorted(
        r["doc_id"]
        for r in snapshot(spark, t)
        .filter("doc_id between 100 and 150")
        .collect()
    )
    assert sorted(r["doc_id"] for r in df.collect()) == want

    # append inherits stats tracking; new file joins the pruning set
    append(spark, t, _seed(spark, 10, offset=5000).coalesce(1))
    df2, st2 = snapshot_pruned(spark, t, "doc_id", lo=5000, hi=5004)
    assert st2["files_skipped"] >= 5
    assert df2.count() == 5

    # delete keeps untouched entries' stats and re-stats rewrites
    delete_rows(spark, t, "doc_id", [120])
    df3, _ = snapshot_pruned(spark, t, "doc_id", lo=100, hi=150)
    assert sorted(r["doc_id"] for r in df3.collect()) == [
        v for v in want if v != 120
    ]
    assert all(isinstance(e, dict) for e in resolve_files(t))

    # out-of-range query: everything skips, empty frame with schema
    df4, st4 = snapshot_pruned(spark, t, "doc_id", lo=10**9)
    assert df4.count() == 0 and st4["files_read"] == 0
    assert set(df4.columns) == {"doc_id", "body"}

    # un-stat'd column refuses to pretend it can prune
    with pytest.raises(ValueError, match="stats"):
        snapshot_pruned(spark, t, "body", lo="a")


def test_incremental_agg_delta_equals_full_recompute(spark, tmp_path):
    """Materialized-view maintenance: old MV + signed delta over ONLY
    the changed files == aggregating the new snapshot from scratch,
    across an append and a targeted delete."""
    from etl_sentinel_imagery_spark.operators.txlog import (
        incremental_agg_delta,
    )

    t = str(tmp_path / "mv")

    def seed(n, offset=0):
        return spark.range(offset, offset + n).select(
            F.col("id").alias("doc_id"),
            (F.col("id") % 3).alias("grp"),
            (F.col("id") * 2).alias("val"),
        )

    init_table(spark, t, seed(300).repartition(5))
    v0 = current_version(t)
    mv0 = {
        r["grp"]: (r["n"], r["sum_val"])
        for r in snapshot(spark, t)
        .groupBy("grp")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("val").alias("sum_val"))
        .collect()
    }
    append(spark, t, seed(60, offset=1000).coalesce(1))
    delete_rows(spark, t, "doc_id", [7, 8, 9, 100])
    v2 = current_version(t)

    delta = {
        r["grp"]: (r["n"], r["sum_val"])
        for r in incremental_agg_delta(
            spark, t, v0, v2, ["grp"], sum_cols=["val"]
        ).collect()
    }
    merged = {}
    for g in set(mv0) | set(delta):
        n = mv0.get(g, (0, 0))[0] + delta.get(g, (0, 0))[0]
        s = mv0.get(g, (0, 0))[1] + delta.get(g, (0, 0))[1]
        merged[g] = (n, s)
    want = {
        r["grp"]: (r["n"], r["sum_val"])
        for r in snapshot(spark, t)
        .groupBy("grp")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("val").alias("sum_val"))
        .collect()
    }
    assert merged == want
    # the delta read strictly fewer files than the table holds
    from etl_sentinel_imagery_spark.operators.txlog import file_diff

    added, removed = file_diff(t, v0, v2)
    n_all = len(resolve_files(t, v2))
    assert len(added) + len(removed) < n_all + len(removed)
    # no-change delta is empty
    assert (
        incremental_agg_delta(spark, t, v2, v2, ["grp"], sum_cols=["val"]).count()
        == 0
    )


def test_delta_chain_crosses_checkpoint(spark, tmp_path):
    """A history longer than CHECKPOINT_EVERY: the checkpoint version
    embeds a full list, later versions resolve by replaying at most
    the post-checkpoint deltas, and every historical version still
    time-travels correctly."""
    from etl_sentinel_imagery_spark.operators.txlog import (
        CHECKPOINT_EVERY,
        read_manifest,
    )

    t = str(tmp_path / "chain")
    init_table(spark, t, _seed(spark, 5).coalesce(1))
    n_commits = CHECKPOINT_EVERY + 3
    for i in range(1, n_commits + 1):
        append(spark, t, _seed(spark, 1, offset=1000 + i).coalesce(1))
    assert current_version(t) == n_commits
    # the checkpoint version embeds a full list AND its delta
    ck = read_manifest(t, CHECKPOINT_EVERY)
    assert "files" in ck and "adds" in ck
    assert len(ck["files"]) == 1 + CHECKPOINT_EVERY  # init file + one per append
    # a later version resolves correctly (replay from the checkpoint)
    assert snapshot(spark, t).count() == 5 + n_commits
    # arbitrary time travel across the chain
    assert snapshot(spark, t, version=7).count() == 5 + 7
    assert snapshot(spark, t, version=CHECKPOINT_EVERY).count() == 5 + CHECKPOINT_EVERY
    assert len(resolve_files(t, 0)) == 1


def test_log_store_seam_conflict_injection(spark, tmp_path):
    """The commit substrate is injectable (object-store CAS seam): a
    store that loses its first N claims surfaces lost races exactly
    like real ones. Appends auto-rebase over them (round 6 — the
    caller never sees TxConflict and the SAME staged files commit
    once, no orphans); a raw _commit still raises."""
    from etl_sentinel_imagery_spark.operators import txlog as tx

    class FlakyStore(tx.PosixLogStore):
        def __init__(self, lose_first: int):
            self.lose = lose_first

        def claim(self, tmp_path, final_path):
            if self.lose > 0:
                self.lose -= 1
                return False
            return super().claim(tmp_path, final_path)

    t = str(tmp_path / "seam")
    init_table(spark, t, _seed(spark, 10))
    tx.set_log_store(FlakyStore(lose_first=1))
    try:
        v = append(spark, t, _seed(spark, 5, offset=100))
        assert v == 1  # rode over the injected loss, one commit
        assert snapshot(spark, t).count() == 15
        # the raw claim path still surfaces conflicts
        tx.set_log_store(FlakyStore(lose_first=1))
        with pytest.raises(TxConflict):
            _commit(t, current_version(t), resolve_files(t), "raw")
    finally:
        tx.set_log_store(tx.PosixLogStore())
    # no orphans: the rebase committed the SAME staged files
    assert vacuum(t, min_age_seconds=0) == []
    assert snapshot(spark, t).count() == 15


def test_partitioned_layout_end_to_end(spark, tmp_path):
    """Hive-partitioned txlog table: entries carry col=val paths, the
    snapshot re-derives partition columns via basePath, appends and
    targeted deletes stay inside their leaves, snapshot_partition
    prunes from manifest paths alone, and compaction preserves the
    layout."""
    from etl_sentinel_imagery_spark.operators.txlog import (
        snapshot_partition,
    )

    t = str(tmp_path / "ptab")

    def seed(n, offset=0):
        return spark.range(offset, offset + n).select(
            F.col("id").alias("doc_id"),
            (F.col("id") % 3).cast("int").alias("bucket3"),
            F.concat(F.lit("p-"), F.col("id")).alias("body"),
        )

    init_table(spark, t, seed(300), partition_cols=["bucket3"])
    snap = snapshot(spark, t)
    assert set(snap.columns) == {"doc_id", "bucket3", "body"}
    assert snap.count() == 300
    assert {r["bucket3"] for r in snap.select("bucket3").distinct().collect()} == {0, 1, 2}
    # manifest paths are hive-style
    for e in resolve_files(t):
        name = e if isinstance(e, str) else e["name"]
        assert "bucket3=" in name

    # partition-pruned read: only bucket3=1 files touched
    df1, st = snapshot_partition(spark, t, {"bucket3": 1})
    assert st["files_read"] < st["files_total"]
    want = sorted(
        r["doc_id"] for r in snap.filter("bucket3 = 1").collect()
    )
    assert sorted(r["doc_id"] for r in df1.collect()) == want

    # append inherits the layout
    append(spark, t, seed(30, offset=1000))
    assert snapshot(spark, t).count() == 330
    df1b, _ = snapshot_partition(spark, t, {"bucket3": 1})
    assert df1b.count() == snapshot(spark, t).filter("bucket3 = 1").count()

    # targeted delete rewrites stay inside their leaf
    delete_rows(spark, t, "doc_id", [4, 1001])
    after = snapshot(spark, t)
    assert after.count() == 328
    assert after.filter(F.col("doc_id").isin([4, 1001])).count() == 0
    for e in resolve_files(t):
        name = e if isinstance(e, str) else e["name"]
        assert "bucket3=" in name
    # partition columns survive the rewrite
    assert set(after.columns) == {"doc_id", "bucket3", "body"}

    # compaction keeps the hive layout
    compact(spark, t, target_files=2)
    snap2 = snapshot(spark, t)
    assert snap2.count() == 328
    assert set(snap2.columns) == {"doc_id", "bucket3", "body"}

    # unknown partition column refuses
    with pytest.raises(ValueError, match="partition column"):
        snapshot_partition(spark, t, {"nope": 1})


def test_truncate_history_and_space_reclaim(spark, tmp_path):
    """Retention: versions past the horizon become unreadable with a
    clear error, retained versions (incl. the now-self-contained
    horizon) still time-travel, and vacuum reclaims files only dead
    history referenced."""
    import os as _os

    from etl_sentinel_imagery_spark.operators.txlog import truncate_history

    t = str(tmp_path / "ret")
    init_table(spark, t, _seed(spark, 50).coalesce(1))
    for i in range(1, 6):
        append(spark, t, _seed(spark, 10, offset=1000 * i).coalesce(1))
    compact(spark, t, target_files=1)  # v6: retires all prior files
    append(spark, t, _seed(spark, 5, offset=9000).coalesce(1))  # v7
    cur = current_version(t)
    n_parquet_before = sum(
        1 for e in _os.listdir(t) if e.endswith(".parquet")
    )

    stats = truncate_history(t, keep_versions=1)  # keep v6, v7
    assert stats["horizon"] == cur - 1
    assert stats["removed_manifests"] == cur - 1
    # retained versions resolve; horizon is self-contained
    assert snapshot(spark, t).count() == 105
    assert snapshot(spark, t, version=cur - 1).count() == 100
    assert "files" in read_manifest(t, cur - 1)
    # truncated versions are a clear error
    with pytest.raises(ValueError, match="retired|does not exist"):
        snapshot(spark, t, version=0)
    # vacuum now reclaims the pre-compaction files
    removed = vacuum(t, min_age_seconds=0)
    assert removed  # the 6 pre-compaction data files
    n_parquet_after = sum(
        1 for e in _os.listdir(t) if e.endswith(".parquet")
    )
    assert n_parquet_after < n_parquet_before
    assert snapshot(spark, t).count() == 105
    assert snapshot(spark, t, version=cur - 1).count() == 100


def _race_writer(args) -> int:
    """Module-level so multiprocessing can pickle it."""
    t, wid = args
    from etl_sentinel_imagery_spark.operators import txlog as tx2

    conflicts = 0
    for i in range(10):
        while True:
            parent = tx2.current_version(t)
            try:
                tx2._commit_delta(
                    t, parent, [f"w{wid}-c{i}.parquet"], [],
                    f"op-w{wid}-c{i}",
                )
                break
            except tx2.TxConflict:
                conflicts += 1
    return conflicts


def test_concurrent_writers_race_the_claim(tmp_path):
    """Real multi-PROCESS concurrency on the claim protocol: 4 writers
    race 10 delta commits each with retry-on-conflict; every commit
    must land exactly once, versions are a gapless linear history, and
    the final resolution contains every writer's files."""
    import json as _json
    import multiprocessing as mp
    import os as _os

    from etl_sentinel_imagery_spark.operators import txlog as tx

    t = str(tmp_path / "race")
    _os.makedirs(tx._log_dir(t), exist_ok=True)
    with open(tx._manifest_path(t, 0), "w") as f:
        _json.dump(
            {"version": 0, "parent": None, "op": "init",
             "stat_cols": [], "partition_cols": [], "files": []},
            f,
        )
    with open(_os.path.join(tx._log_dir(t), "_CURRENT"), "w") as f:
        f.write("0")

    with mp.Pool(4) as pool:
        conflict_counts = pool.map(
            _race_writer, [(t, wid) for wid in range(4)]
        )

    assert tx.current_version(t) == 40  # every commit landed exactly once
    ops = [h["op"] for h in tx.history(t)]
    assert len(ops) == 41 and len(set(ops)) == 41  # gapless, no dupes
    names = {tx._entry_name(e) for e in tx.resolve_files(t)}
    assert names == {
        f"w{w}-c{i}.parquet" for w in range(4) for i in range(10)
    }
    # the race was real: at least one writer actually lost a claim
    assert sum(conflict_counts) > 0


def test_optimize_zorder_closes_the_metadata_loop(spark, tmp_path):
    """OPTIMIZE ZORDER BY: same rows, fewer files, and range queries
    on BOTH clustered dims prune from manifest stats alone; time
    travel to the pre-optimize layout stays exact."""
    from etl_sentinel_imagery_spark.operators.txlog import (
        optimize,
        snapshot_pruned,
    )

    t = str(tmp_path / "t_opt")
    # interleaved x/y ranges across 8 appended files → nothing prunes
    rows = spark.range(0, 4000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 64).alias("x"),
        ((F.col("id") * 7) % 64).alias("y"),
    )
    init_table(spark, t, rows.repartition(8), stat_cols=["x", "y"])
    before = snapshot(spark, t).orderBy("doc_id").collect()
    _, pre = snapshot_pruned(spark, t, "x", lo=0, hi=7)
    assert pre["files_skipped"] == 0  # interleaved: no file skips

    v_pre = current_version(t)
    v = optimize(spark, t, zorder_by=["x", "y"], target_files=8)
    assert history(t)[-1]["op"] == "optimize"

    after = snapshot(spark, t).orderBy("doc_id").collect()
    assert after == before
    dfx, sx = snapshot_pruned(spark, t, "x", lo=0, hi=7)
    dfy, sy = snapshot_pruned(spark, t, "y", lo=0, hi=7)
    assert sx["files_skipped"] >= 4 and sy["files_skipped"] >= 4
    want_x = sum(1 for r in before if 0 <= r["x"] <= 7)
    want_y = sum(1 for r in before if 0 <= r["y"] <= 7)
    assert dfx.count() == want_x and dfy.count() == want_y
    # time travel: the pre-optimize version still reads its old files
    assert (
        snapshot(spark, t, v_pre).orderBy("doc_id").collect() == before
    )
    assert v == v_pre + 1


def test_optimize_plain_compaction_and_conflict(spark, tmp_path):
    from etl_sentinel_imagery_spark.operators.txlog import optimize

    t = str(tmp_path / "t_opt2")
    init_table(spark, t, _seed(spark, 100).repartition(6))
    n_before = len(
        [e for e in os.listdir(t) if e.endswith(".parquet")]
    )
    optimize(spark, t, target_files=1)
    files = resolve_files(t)
    assert len(files) == 1
    assert snapshot(spark, t).count() == 100
    assert n_before > 1


def test_schema_evolution_add_column(spark, tmp_path):
    """Append with a new column widens the recorded schema: old rows
    read NULL for it, snapshots of earlier versions keep the narrow
    schema, a later narrow append back-fills NULL, and a type conflict
    raises."""
    from etl_sentinel_imagery_spark.operators.txlog import append

    t = str(tmp_path / "t_evo")
    init_table(spark, t, _seed(spark, 10).coalesce(1))
    v0 = current_version(t)

    wide = _seed(spark, 5, offset=100).withColumn(
        "tag", F.concat(F.lit("t-"), F.col("doc_id"))
    )
    append(spark, t, wide.coalesce(1))

    snap = snapshot(spark, t)
    assert set(snap.columns) == {"doc_id", "body", "tag"}
    assert snap.count() == 15
    assert snap.filter(F.col("tag").isNull()).count() == 10  # old rows
    assert snap.filter(F.col("tag") == "t-100").count() == 1
    # filters on the evolved column work over the whole table
    assert snap.filter(F.col("tag").isNotNull()).count() == 5
    # time travel: the pre-evolution version keeps the narrow schema
    assert set(snapshot(spark, t, v0).columns) == {"doc_id", "body"}

    # a narrow append AFTER evolution back-fills NULL
    append(spark, t, _seed(spark, 3, offset=200).coalesce(1))
    snap2 = snapshot(spark, t)
    assert snap2.count() == 18
    assert snap2.filter(F.col("tag").isNull()).count() == 13

    # type conflict refuses
    bad = _seed(spark, 1, offset=300).withColumn("tag", F.lit(7))
    with pytest.raises(ValueError, match="type conflict"):
        append(spark, t, bad)


def test_schema_survives_compact_and_optimize(spark, tmp_path):
    from etl_sentinel_imagery_spark.operators.txlog import (
        append,
        compact,
        optimize,
    )

    t = str(tmp_path / "t_evo2")
    init_table(spark, t, _seed(spark, 10).coalesce(1))
    append(
        spark,
        t,
        _seed(spark, 5, offset=50)
        .withColumn("extra", F.lit(1.5))
        .coalesce(1),
    )
    compact(spark, t, target_files=1)
    assert set(snapshot(spark, t).columns) == {"doc_id", "body", "extra"}
    optimize(spark, t, target_files=1)
    snap = snapshot(spark, t)
    assert set(snap.columns) == {"doc_id", "body", "extra"}
    assert snap.count() == 15


def test_table_changes_cdf(spark, tmp_path):
    """Row-level change feed from the manifests: inserts per append,
    exact dropped rows per delete (the rewrite's surviving rows cancel
    in the multiset diff), rewrite commits skipped by default and
    provably empty when included, windowing by from_version, and
    replaying the feed reconstructs the snapshot."""
    from collections import Counter

    from etl_sentinel_imagery_spark.operators.txlog import (
        append,
        compact,
        delete_rows,
        table_changes,
    )

    t = str(tmp_path / "t_cdf")
    init_table(spark, t, _seed(spark, 10).coalesce(1))          # v0
    append(spark, t, _seed(spark, 5, offset=100).coalesce(1))   # v1
    delete_rows(spark, t, "doc_id", [0, 1, 102])                # v2
    compact(spark, t, target_files=1)                           # v3

    feed = table_changes(spark, t, -1).collect()
    by_v = {}
    for r in feed:
        by_v.setdefault((r["_commit_version"], r["_change_type"]), []).append(r)
    assert {k[0] for k in by_v} == {0, 1, 2}  # compaction silent
    assert sorted(r["doc_id"] for r in by_v[(0, "insert")]) == list(range(10))
    assert sorted(r["doc_id"] for r in by_v[(1, "insert")]) == [
        100, 101, 102, 103, 104,
    ]
    assert sorted(r["doc_id"] for r in by_v[(2, "delete")]) == [0, 1, 102]
    assert (2, "insert") not in by_v  # rewrite survivors cancel
    assert all(r["_commit_op"] == "delete" for r in by_v[(2, "delete")])

    # a verified rewrite: including it must add nothing (clean compaction)
    full = table_changes(spark, t, -1, include_rewrites=True)
    assert full.filter(F.col("_commit_version") == 3).count() == 0

    # windowing: from_version=0 excludes the init rows
    assert {
        r["_commit_version"]
        for r in table_changes(spark, t, 0).collect()
    } == {1, 2}

    # replay: inserts ⊖ deletes == current snapshot (multiset)
    ins = Counter(
        r["doc_id"] for r in feed if r["_change_type"] == "insert"
    )
    ins.subtract(
        r["doc_id"] for r in feed if r["_change_type"] == "delete"
    )
    snap = Counter(r["doc_id"] for r in snapshot(spark, t).collect())
    assert +ins == snap

    # empty window returns an empty, correctly-shaped feed
    v = current_version(t)
    empty = table_changes(spark, t, v, v)
    assert empty.count() == 0
    assert {"_change_type", "_commit_version", "_commit_op"} <= set(
        empty.columns
    )


def test_table_changes_spans_schema_evolution(spark, tmp_path):
    from etl_sentinel_imagery_spark.operators.txlog import (
        append,
        table_changes,
    )

    t = str(tmp_path / "t_cdf_evo")
    init_table(spark, t, _seed(spark, 4).coalesce(1))           # v0
    append(                                                     # v1 wide
        spark,
        t,
        _seed(spark, 2, offset=50)
        .withColumn("tag", F.concat(F.lit("t-"), F.col("doc_id")))
        .coalesce(1),
    )
    feed = table_changes(spark, t, -1)
    assert "tag" in feed.columns  # widened throughout
    rows = {r["doc_id"]: r for r in feed.collect()}
    assert rows[0]["tag"] is None          # pre-evolution insert NULL-fills
    assert rows[50]["tag"] == "t-50"


def test_schema_evolution_partitioned_table(spark, tmp_path):
    """Metadata schema + basePath together: a partitioned table widens
    on append like the unpartitioned path — partition columns fill
    from hive paths, pre-evolution files NULL-fill the new column, and
    the CDF spans the evolution."""
    from etl_sentinel_imagery_spark.operators.txlog import (
        append,
        table_changes,
    )

    t = str(tmp_path / "pt_evo")

    def seed(n, offset=0):
        return spark.range(offset, offset + n).select(
            F.col("id").alias("doc_id"),
            (F.col("id") % 2).cast("int").alias("par"),
            F.concat(F.lit("p-"), F.col("id")).alias("body"),
        )

    init_table(spark, t, seed(20), partition_cols=["par"])
    append(
        spark,
        t,
        seed(4, offset=100).withColumn(
            "lang", F.lit("en")
        ),
    )
    snap = snapshot(spark, t)
    assert set(snap.columns) == {"doc_id", "par", "body", "lang"}
    assert snap.count() == 24
    assert snap.filter(F.col("lang").isNull()).count() == 20
    assert {
        r["par"] for r in snap.select("par").distinct().collect()
    } == {0, 1}
    # pushable filter on the evolved column + partition column together
    assert (
        snap.filter((F.col("lang") == "en") & (F.col("par") == 0)).count()
        == 2
    )
    feed = table_changes(spark, t, -1)
    assert "lang" in feed.columns
    assert feed.filter(
        (F.col("_commit_version") == 0) & F.col("lang").isNotNull()
    ).count() == 0


def test_cdf_and_mv_delta_agree(spark, tmp_path):
    """The two incremental paths cross-check: aggregating the change
    feed (inserts positive, deletes negative) over a version range
    must equal incremental_agg_delta's signed file-diff aggregate —
    independent computations of the same delta."""
    from etl_sentinel_imagery_spark.operators.txlog import (
        append,
        delete_rows,
        incremental_agg_delta,
        table_changes,
    )

    t = str(tmp_path / "t_xchk")
    seed = _seed(spark, 40).withColumn(
        "g", (F.col("doc_id") % 4).cast("int")
    ).withColumn("val", F.col("doc_id") * 2)
    init_table(spark, t, seed.coalesce(2))                      # v0
    append(                                                     # v1
        spark,
        t,
        _seed(spark, 10, offset=200)
        .withColumn("g", (F.col("doc_id") % 4).cast("int"))
        .withColumn("val", F.col("doc_id") * 2)
        .coalesce(1),
    )
    delete_rows(spark, t, "doc_id", [0, 4, 201])                # v2

    v_from, v_to = 0, current_version(t)
    mv = {
        r["g"]: (r["n"], r["sum_val"])
        for r in incremental_agg_delta(
            spark, t, v_from, v_to, ["g"], sum_cols=["val"]
        ).collect()
    }
    feed = table_changes(spark, t, v_from)
    sign = F.when(F.col("_change_type") == "insert", 1).otherwise(-1)
    cdf = {
        r["g"]: (r["n"], r["sum_val"])
        for r in feed.groupBy("g")
        .agg(
            F.sum(sign).alias("n"),
            F.sum(sign * F.col("val")).alias("sum_val"),
        )
        .collect()
    }
    # drop net-zero groups from both (incremental_agg_delta keeps them)
    mv = {k: v for k, v in mv.items() if v != (0, 0)}
    cdf = {k: v for k, v in cdf.items() if v != (0, 0)}
    assert mv == cdf and len(cdf) >= 3


def test_orphaned_claim_recovers_without_wedging(spark, tmp_path):
    """Crash between manifest claim and pointer flip (ADVICE r4): the
    claimed manifest IS a valid commit, so the table must neither lose
    it nor wedge — current_version scans forward past the stale
    pointer, readers see the committed rows, and the next commit
    claims the following number (which also heals the pointer)."""
    from etl_sentinel_imagery_spark.operators import txlog as tx

    class CrashBeforeFlip(tx.PosixLogStore):
        def replace(self, tmp_path, final_path):
            raise RuntimeError("simulated crash before pointer flip")

    t = str(tmp_path / "orphan")
    init_table(spark, t, _seed(spark, 10))
    tx.set_log_store(CrashBeforeFlip())
    try:
        with pytest.raises(RuntimeError, match="pointer flip"):
            append(spark, t, _seed(spark, 5, offset=100))
    finally:
        tx.set_log_store(tx.PosixLogStore())
    # the raw pointer file still says 0, but the claim committed v1
    with open(os.path.join(t, "_txlog", "_CURRENT")) as f:
        assert int(f.read().strip()) == 0
    assert current_version(t) == 1
    assert snapshot(spark, t).count() == 15
    # the table is NOT wedged: the successor claims v2 and the
    # pointer cache heals
    v = append(spark, t, _seed(spark, 7, offset=200))
    assert v == 2
    with open(os.path.join(t, "_txlog", "_CURRENT")) as f:
        assert int(f.read().strip()) == 2
    assert snapshot(spark, t).count() == 22
    assert [h["op"] for h in history(t)] == ["init", "append", "append"]


def test_vacuum_walks_partition_subdirs_and_age_gate(spark, tmp_path):
    """Orphans inside hive col=val/ leaves are reclaimed (pre-fix they
    were invisible to the top-level listdir); referenced partitioned
    files survive; min_age_seconds protects just-written files."""
    t = str(tmp_path / "vsub")
    df = spark.range(60).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 2).cast("int").alias("par"),
        F.concat(F.lit("x-"), F.col("id")).alias("body"),
    )
    init_table(spark, t, df, partition_cols=["par"])
    leaf = os.path.join(t, "par=0")
    orphan = os.path.join(leaf, "part-orphan.parquet")
    with open(orphan, "wb") as f:
        f.write(b"junk")
    # age gate: a fresh orphan survives a guarded vacuum
    assert vacuum(t, min_age_seconds=3600) == []
    assert os.path.exists(orphan)
    # unguarded: reclaimed by its table-relative name
    assert vacuum(t, min_age_seconds=0) == [os.path.join("par=0", "part-orphan.parquet")]
    assert not os.path.exists(orphan)
    assert snapshot(spark, t).count() == 60


def test_snapshot_pruned_honors_partition_and_schema_contract(
    spark, tmp_path
):
    """snapshot_pruned reads under the same contract as snapshot():
    hive partition columns come back via basePath and the recorded
    schema NULL-fills files written before an add-column evolution
    (pre-fix it footer-inferred and silently dropped partition cols)."""
    from etl_sentinel_imagery_spark.operators.txlog import snapshot_pruned

    t = str(tmp_path / "sp")

    def seed(n, offset=0, extra=False):
        df = spark.range(offset, offset + n).select(
            F.col("id").alias("doc_id"),
            (F.col("id") % 2).cast("int").alias("par"),
            F.concat(F.lit("s-"), F.col("id")).alias("body"),
        )
        if extra:
            df = df.withColumn("score", (F.col("doc_id") * 2).cast("long"))
        return df

    init_table(
        spark, t, seed(100), stat_cols=["doc_id"], partition_cols=["par"]
    )
    append(spark, t, seed(40, offset=1000, extra=True))  # add-column
    pruned, st = snapshot_pruned(spark, t, "doc_id", lo=1000)
    assert st["files_skipped"] > 0
    # partition column AND evolved column both present
    assert set(pruned.columns) == {"doc_id", "par", "body", "score"}
    got = {
        (r["doc_id"], r["par"], r["score"])
        for r in pruned.collect()
    }
    want = {
        (r["doc_id"], r["par"], r["score"])
        for r in snapshot(spark, t).filter("doc_id >= 1000").collect()
    }
    assert got == want
    # range touching only OLD files: evolved column comes back NULL,
    # not missing
    pruned_old, _ = snapshot_pruned(spark, t, "doc_id", hi=50)
    assert "score" in pruned_old.columns
    assert pruned_old.filter(F.col("score").isNotNull()).count() == 0
    assert pruned_old.count() == 51


def test_schema_evolution_type_widening(spark, tmp_path):
    """int→long / float→double widening (round-4 verdict #3): a
    widened append reads back wide over the OLD narrow files (the
    parquet reader's widening promotion — no rewrite), narrow time
    travel keeps the narrow schema, genuinely lossy or incompatible
    changes still raise, and a narrower write after the widening
    upcasts under the wide recorded schema."""
    t = str(tmp_path / "wide")

    def seed(n, offset, int_t, float_t):
        return spark.range(offset, offset + n).select(
            F.col("id").alias("doc_id"),
            F.col("id").cast(int_t).alias("qty"),
            (F.col("id") / 2).cast(float_t).alias("score"),
        )

    init_table(spark, t, seed(10, 0, "int", "float"))
    v1 = append(spark, t, seed(10, 100, "long", "double"))  # widen both
    snap = snapshot(spark, t)
    assert dict(snap.dtypes) == {
        "doc_id": "bigint", "qty": "bigint", "score": "double",
    }
    assert snap.count() == 20
    # old rows served wide, values intact
    assert snap.filter("doc_id = 5").first()["qty"] == 5
    # narrow time travel: version 0 still reads its own narrow schema
    old = snapshot(spark, t, version=0)
    assert dict(old.dtypes)["qty"] == "int"
    assert dict(old.dtypes)["score"] == "float"
    # a NARROW write after the widening upcasts under the wide schema
    append(spark, t, seed(5, 200, "int", "float"))
    snap2 = snapshot(spark, t)
    assert dict(snap2.dtypes)["qty"] == "bigint"
    assert snap2.count() == 25
    assert snap2.filter("doc_id = 201").first()["qty"] == 201
    # the byte→short→int chain widens too
    t2 = str(tmp_path / "chain")
    init_table(spark, t2, seed(4, 0, "byte", "float"))
    append(spark, t2, seed(4, 50, "short", "float"))
    assert dict(snapshot(spark, t2).dtypes)["qty"] == "smallint"
    # incompatible: string→int raises
    bad = spark.range(3).select(
        F.col("id").alias("doc_id"),
        F.col("id").cast("string").alias("qty"),
        F.lit(1.0).cast("double").alias("score"),
    )
    with pytest.raises(ValueError, match="type conflict"):
        append(spark, t, bad)
    # lossy: long→double raises (2^53 cliff)
    lossy = spark.range(3).select(
        F.col("id").alias("doc_id"),
        F.col("id").cast("long").alias("qty"),
        F.col("id").cast("double").alias("score"),
    ).withColumn("qty", F.col("qty").cast("long"))
    t3 = str(tmp_path / "lossy")
    init_table(spark, t3, seed(4, 0, "long", "double"))
    bad2 = spark.range(3).select(
        F.col("id").alias("doc_id"),
        F.col("id").cast("double").alias("qty"),
        F.lit(1.0).cast("double").alias("score"),
    )
    with pytest.raises(ValueError, match="type conflict"):
        append(spark, t3, bad2)
    # the CHANGE FEED spans the widening: one unioned wide schema
    from etl_sentinel_imagery_spark.operators.txlog import table_changes

    feed = table_changes(spark, t, -1, v1)
    assert dict(feed.dtypes)["qty"] == "bigint"
    assert feed.count() == 20
