"""Segmented parquet checkpoints — the manifest format at 100 TB.

Above PARQUET_CHECKPOINT_MIN entries, every CHECKPOINT_EVERY-th commit
stops embedding the full file list as inline JSON (86 MB and ~10 s per
checkpoint at 1M files, measured) and instead records an ordered
segment list over immutable parquet PART files: the next checkpoint
REUSES the previous one's parts and appends only the churn (one drop
segment + one part), so checkpoint cost is O(changes), not O(table) —
Delta's v2 checkpoints / Iceberg's manifest lists, re-expressed.

Tests force the parts path with a tiny threshold; the default
threshold keeps small tables inline (every other suite is the
regression that the flip is invisible).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from etl_sentinel_imagery_spark.operators import txlog as tx
from etl_sentinel_imagery_spark.operators.txlog import (
    CHECKPOINT_EVERY,
    append,
    clone_table,
    current_version,
    delete_rows_dv,
    init_table,
    read_manifest,
    resolve_files,
    restore,
    snapshot,
    table_changes,
    truncate_history,
    vacuum,
)


@pytest.fixture
def tiny_threshold(monkeypatch):
    monkeypatch.setattr(tx, "PARQUET_CHECKPOINT_MIN", 4)
    monkeypatch.setattr(tx, "_PART_TARGET", 8)


def _seed(spark, n=40, offset=0):
    return spark.range(offset, offset + n).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 5).cast("int").alias("grp"),
        F.concat(F.lit("pc-"), F.col("id")).alias("body"),
    )


def _parts_of(m):
    return [
        s["part"]
        for s in m["files_parts"]["segments"]
        if "part" in s
    ]


def test_part_entry_round_trip_is_exact(tmp_path):
    """Every entry shape survives parquet parts bit-exactly: plain
    strings, stats maps with mixed types, DV chains, row tracking
    marks, and unknown future keys (the extra column)."""
    t = str(tmp_path / "rt")
    os.makedirs(t)
    entries = [
        "legacy-plain-name.parquet",
        {"name": "a.parquet", "rows": 10, "bytes": 123},
        {
            "name": "b.parquet",
            "rows": 7,
            "bytes": 99,
            "stats": {"k": [1, 9], "s": ["aa", "zz"], "f": [0.5, 2.25]},
            "dv": ["_dv/dv-1", "_dv/dv-2"],
            "dv_n": 3,
        },
        {"name": "c.parquet", "rows": 1, "bytes": 5, "base_rid": 42},
        {"name": "d.parquet", "rows": 2, "bytes": 6, "rid": True},
        {"name": "e.parquet", "rows": 2, "bytes": 6, "future_key": {"x": 1}},
    ]
    seg = tx._write_part(t, entries)
    assert seg["n"] == len(entries)
    back = tx._read_part(t, seg["part"])
    assert sorted(back, key=tx._entry_name) == sorted(
        entries, key=tx._entry_name
    )


def test_checkpoint_switches_to_parts_and_resolves_identically(
    spark, tmp_path, tiny_threshold
):
    t = str(tmp_path / "parts")
    init_table(spark, t, _seed(spark, 12).repartition(6))
    expected = {(r["doc_id"], r["body"]) for r in _seed(spark, 12).collect()}
    rows = 12
    while current_version(t) < CHECKPOINT_EVERY:
        append(spark, t, _seed(spark, 2, offset=100 + rows).coalesce(1))
        rows += 2
    m = read_manifest(t, CHECKPOINT_EVERY)
    assert "files" not in m and "files_parts" in m
    # resolve through the parts checkpoint == replaying the chain from
    # the inline init (the two representations must be one truth)
    assert snapshot(spark, t).count() == rows
    # time travel to pre-checkpoint versions still works
    assert {
        (r["doc_id"], r["body"])
        for r in snapshot(spark, t, version=0).collect()
    } == expected


def test_second_checkpoint_reuses_first_checkpoints_parts(
    spark, tmp_path, tiny_threshold
):
    t = str(tmp_path / "reuse")
    # churn per checkpoint window (~20 commits) must be small relative
    # to the table for reuse to win over the debt-compaction bound —
    # exactly the 100 TB proportion (a 1M-file table, 100-file churn)
    init_table(spark, t, _seed(spark, 300).repartition(150))
    while current_version(t) < CHECKPOINT_EVERY:
        append(spark, t, _seed(spark, 1, offset=1000).coalesce(1))
    m1 = read_manifest(t, CHECKPOINT_EVERY)
    first_parts = _parts_of(m1)
    assert first_parts
    # the init commit itself went to parts (>= threshold) and the
    # first checkpoint already reused ITS parts
    assert set(_parts_of(read_manifest(t, 0))) <= set(first_parts)
    # small churn to the next checkpoint: appends + one DV delete
    append(spark, t, _seed(spark, 1, offset=2000).coalesce(1))
    delete_rows_dv(spark, t, "doc_id", [0])
    while current_version(t) < 2 * CHECKPOINT_EVERY:
        append(spark, t, _seed(spark, 1, offset=3000).coalesce(1))
    m2 = read_manifest(t, 2 * CHECKPOINT_EVERY)
    segs2 = m2["files_parts"]["segments"]
    # every first-checkpoint part is reused verbatim, in order
    assert _parts_of(m2)[: len(first_parts)] == first_parts
    # the window's churn rides ONE drop segment + ONE fresh part
    drops2 = [s for s in segs2 if "drop" in s]
    drops1 = [s for s in m1["files_parts"]["segments"] if "drop" in s]
    assert len(drops2) == len(drops1) + 1
    assert len(_parts_of(m2)) == len(first_parts) + 1
    # and the fold IS the state at the checkpoint's own version
    folded = tx._entries_from_parts(t, m2["files_parts"])
    assert folded == {
        tx._entry_name(e): e
        for e in resolve_files(t, 2 * CHECKPOINT_EVERY)
    }
    assert snapshot(spark, t).where("doc_id = 0").count() == 0


def test_drop_debt_triggers_compaction_rewrite(
    spark, tmp_path, tiny_threshold, monkeypatch
):
    """When accumulated drops exceed the debt bound, the checkpoint
    compacts into fresh parts with no drop segments (Iceberg's
    manifest compaction) — and resolves identically."""
    t = str(tmp_path / "debt")
    init_table(spark, t, _seed(spark, 12).repartition(6))
    # churn hard: add a row, then delete it — every pair is pure drop
    # debt for the next checkpoint
    live: set[int] = set(range(12))
    k = 0
    for _ in range(3 * CHECKPOINT_EVERY):
        if k % 2 == 0:
            append(
                spark, t, _seed(spark, 1, offset=5000 + k).coalesce(1)
            )
            live.add(5000 + k)
        else:
            delete_rows_dv(spark, t, "doc_id", [5000 + k - 1])
            live.discard(5000 + k - 1)
        k += 1
    v = (current_version(t) // CHECKPOINT_EVERY) * CHECKPOINT_EVERY
    m = read_manifest(t, v)
    fp = m.get("files_parts")
    assert fp is not None
    # the debt bound held at every checkpoint: the newest one's
    # accumulated drops stay within 25% of the parts' entry total
    dropped = sum(len(s["drop"]) for s in fp["segments"] if "drop" in s)
    total = sum(s["n"] for s in fp["segments"] if "part" in s)
    assert dropped * 4 <= max(total, 4 * tx.PARQUET_CHECKPOINT_MIN)
    # and a compaction actually happened along the way: some earlier
    # checkpoint's parts are no longer referenced by the newest one
    first_ck = read_manifest(t, CHECKPOINT_EVERY)
    assert not set(_parts_of(first_ck)) <= set(_parts_of(m))
    # live rows exact through all the churn
    snap = snapshot(spark, t)
    assert {
        r["doc_id"] for r in snap.collect()
    } == live


def test_vacuum_pins_part_referenced_files_and_sweeps_orphan_parts(
    spark, tmp_path, tiny_threshold
):
    t = str(tmp_path / "vac")
    init_table(spark, t, _seed(spark, 12).repartition(6))
    while current_version(t) < CHECKPOINT_EVERY:
        append(spark, t, _seed(spark, 1, offset=1000).coalesce(1))
    parts_dir = os.path.join(t, "_txlog", "parts")
    live_parts = set(os.listdir(parts_dir))
    assert live_parts
    # an orphan part (lost claim race shape) sweeps; live parts stay
    orphan = os.path.join(parts_dir, "part-orphan.parquet")
    with open(orphan, "wb") as f:
        f.write(b"junk")
    before = snapshot(spark, t).count()
    removed = vacuum(t, min_age_seconds=0)
    assert os.path.join("_txlog", "parts", "part-orphan.parquet") in removed
    # no data file referenced only through parts was vacuumed
    assert snapshot(spark, t).count() == before
    assert set(os.listdir(parts_dir)) == live_parts


def test_truncate_horizon_self_contains_via_part_reuse(
    spark, tmp_path, tiny_threshold
):
    t = str(tmp_path / "trunc")
    init_table(spark, t, _seed(spark, 12).repartition(6))
    while current_version(t) < CHECKPOINT_EVERY + 3:
        append(spark, t, _seed(spark, 1, offset=1000).coalesce(1))
    delete_rows_dv(spark, t, "doc_id", [3])
    cur = current_version(t)
    expected = sorted(
        map(tuple, snapshot(spark, t).collect())
    )
    ck_parts = set(_parts_of(read_manifest(t, CHECKPOINT_EVERY)))
    out = truncate_history(t, keep_versions=2)
    horizon = out["horizon"]
    hm = read_manifest(t, horizon)
    assert hm["parent"] is None
    assert "files_parts" in hm and "files" not in hm
    # the horizon REUSED the (now-retired) checkpoint's parts instead
    # of re-embedding the table
    assert ck_parts <= set(_parts_of(hm))
    assert sorted(map(tuple, snapshot(spark, t).collect())) == expected
    # vacuum after truncation keeps everything the horizon references
    vacuum(t, min_age_seconds=0)
    assert sorted(map(tuple, snapshot(spark, t).collect())) == expected
    # the horizon also serves as a stream's initial snapshot
    fd = table_changes(spark, t, horizon - 1 if horizon > 0 else -1, cur)
    assert fd.count() > 0


def test_restore_across_parts_checkpoint(spark, tmp_path, tiny_threshold):
    t = str(tmp_path / "rst")
    init_table(spark, t, _seed(spark, 12).repartition(6))
    while current_version(t) < CHECKPOINT_EVERY:
        append(spark, t, _seed(spark, 1, offset=1000).coalesce(1))
    frozen = sorted(map(tuple, snapshot(spark, t).collect()))
    delete_rows_dv(spark, t, "doc_id", [1, 2])
    append(spark, t, _seed(spark, 3, offset=7000).coalesce(1))
    restore(spark, t, CHECKPOINT_EVERY)
    assert sorted(map(tuple, snapshot(spark, t).collect())) == frozen


def test_clone_of_parts_scale_source(spark, tmp_path, tiny_threshold):
    src = str(tmp_path / "src")
    init_table(spark, src, _seed(spark, 12).repartition(6))
    dest = str(tmp_path / "dest")
    clone_table(src, dest)
    m = read_manifest(dest, 0)
    assert "files_parts" in m
    # clone-owned parts live under the CLONE's log dir
    assert all(
        p.startswith(os.path.join("_txlog", "parts"))
        for p in _parts_of(m)
    )
    assert sorted(map(tuple, snapshot(spark, dest).collect())) == sorted(
        map(tuple, snapshot(spark, src).collect())
    )
    # clone-local delete never touches the source
    delete_rows_dv(spark, dest, "doc_id", [4])
    assert snapshot(spark, dest).count() == 11
    assert snapshot(spark, src).count() == 12
