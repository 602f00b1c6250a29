"""ANALYZE TABLE — after-the-fact manifest stats backfill.

A table initialized without ``stat_cols`` cannot stats-prune; at
100 TB the alternative to this verb is re-ingesting the table.
``analyze_table`` does one executor-side footer pass and a pure
metadata repoint: every live entry gains [min, max] bounds keyed by
physical column name, keeping DV chains / row counts / base_rids, so
every existing read and probe contract is untouched.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_sentinel_imagery_spark.operators import txlog as tx
from etl_sentinel_imagery_spark.operators.txlog import (
    analyze_table,
    append,
    current_version,
    delete_rows_dv,
    init_table,
    read_manifest,
    rename_column,
    snapshot,
    snapshot_pruned,
)


def _seed(spark, n=40, offset=0):
    return spark.range(offset, offset + n).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 5).cast("int").alias("grp"),
        F.concat(F.lit("an-"), F.col("id")).alias("body"),
    )


def test_analyze_enables_pruning_on_statless_table(spark, tmp_path):
    t = str(tmp_path / "an")
    # NO stat_cols at init; three files with disjoint key ranges
    init_table(spark, t, _seed(spark, 20).coalesce(1))
    append(spark, t, _seed(spark, 20, offset=100).coalesce(1))
    append(spark, t, _seed(spark, 20, offset=200).coalesce(1))
    with pytest.raises(ValueError):
        snapshot_pruned(spark, t, "doc_id", lo=100, hi=110)
    v = analyze_table(spark, t, ["doc_id"])
    assert v == current_version(t)
    assert read_manifest(t, v)["stat_cols"] == ["doc_id"]
    df, stats = snapshot_pruned(spark, t, "doc_id", lo=100, hi=110)
    assert stats["files_skipped"] == 2 and stats["files_read"] == 1
    assert df.count() == 11
    # later appends inherit stats tracking at write time
    append(spark, t, _seed(spark, 20, offset=300).coalesce(1))
    _, stats = snapshot_pruned(spark, t, "doc_id", lo=300, hi=305)
    assert stats["files_skipped"] == 3


def test_analyze_preserves_dv_chains_and_history(spark, tmp_path):
    t = str(tmp_path / "andv")
    init_table(spark, t, _seed(spark, 30).coalesce(1))
    append(spark, t, _seed(spark, 30, offset=100).coalesce(1))
    delete_rows_dv(spark, t, "doc_id", [5, 105])
    before = sorted(map(tuple, snapshot(spark, t).collect()))
    v_pre = current_version(t)
    analyze_table(spark, t, ["doc_id"])
    # rows identical; deleted keys stay deleted (dv chain survived the
    # metadata repoint)
    assert sorted(map(tuple, snapshot(spark, t).collect())) == before
    for e in tx.resolve_files(t):
        if tx._entry_dvs(e):
            assert "stats" in e  # stats merged INTO the dv entry
    # time travel to the pre-analyze version is unchanged
    assert sorted(
        map(tuple, snapshot(spark, t, version=v_pre).collect())
    ) == before
    # the probe ladder now prunes deletes by stats on this table
    probe = tx._stats_probe_subset(
        tx.resolve_files(t), "doc_id", 100, 101
    )
    assert len(probe) == 1


def test_analyze_stats_keyed_physical_after_rename(spark, tmp_path):
    t = str(tmp_path / "anrn")
    init_table(spark, t, _seed(spark, 20).coalesce(1))
    append(spark, t, _seed(spark, 20, offset=100).coalesce(1))
    rename_column(t, "doc_id", "document_id")
    analyze_table(spark, t, ["document_id"])
    df, stats = snapshot_pruned(
        spark, t, "document_id", lo=100, hi=105
    )
    assert stats["files_skipped"] == 1
    assert df.count() == 6
    # the stored key is the retired PHYSICAL name
    e = tx.resolve_files(t)[0]
    assert "doc_id" in e["stats"] and "document_id" not in e["stats"]


def test_analyze_missing_column_files_always_probed(spark, tmp_path):
    """Files predating an added column record no bound for it and are
    always probed — pruning stays exact, never a heuristic."""
    t = str(tmp_path / "anmiss")
    init_table(spark, t, _seed(spark, 10).coalesce(1))
    append(
        spark,
        t,
        _seed(spark, 10, offset=100)
        .withColumn("score", F.col("doc_id") * 2)
        .coalesce(1),
    )
    analyze_table(spark, t, ["score"])
    df, stats = snapshot_pruned(spark, t, "score", lo=0, hi=10)
    # the pre-evolution file has no score stats -> read; the evolved
    # file's range [200, 218] misses -> skipped
    assert stats["files_read"] == 1 and stats["files_skipped"] == 1
    assert df.count() == 0


def test_analyze_parts_scale_stats_never_visit_driver(
    spark, tmp_path, monkeypatch
):
    """Round-6 verdict #6: at parts-checkpoint scale the per-file
    stats stream straight into executor-written checkpoint parts —
    the driver opens NO parquet footers and collects only the
    O(parts) segment records, never a file-count-sized stats list.
    Thresholds are monkeypatched down so 10 real files exercise the
    exact 10k+-file code path."""
    import pyarrow.parquet as pq_mod

    DataFrame = type(spark.range(1))  # the CONCRETE class (classic
    # DataFrame overrides collect; patching the abstract re-export
    # would spy on nothing)
    t = str(tmp_path / "anparts")
    init_table(spark, t, _seed(spark, 10).coalesce(1))
    for i in range(9):
        append(
            spark, t, _seed(spark, 10, offset=100 * (i + 1)).coalesce(1)
        )
    tx.enable_row_tracking(t)
    rt_before = tx.resolve_row_tracking(t)
    assert rt_before, "row tracking on — the full-list manifest must carry it"
    before = sorted(map(tuple, snapshot(spark, t).collect()))

    monkeypatch.setattr(tx, "PARQUET_CHECKPOINT_MIN", 6)
    monkeypatch.setattr(tx, "_PART_TARGET", 4)
    # spy 1: no DRIVER-side footer opens (executor workers are
    # separate processes — this patch only sees the driver)
    driver_footers = []
    orig_pf = pq_mod.ParquetFile

    def spy_pf(*a, **k):
        driver_footers.append(a)
        return orig_pf(*a, **k)

    monkeypatch.setattr(pq_mod, "ParquetFile", spy_pf)
    # spy 2: every driver collect during analyze is part-sized
    collected = []
    orig_collect = DataFrame.collect

    def spy_collect(self):
        rows = orig_collect(self)
        collected.append(len(rows))
        return rows

    monkeypatch.setattr(DataFrame, "collect", spy_collect)
    v = analyze_table(spark, t, ["doc_id"])
    monkeypatch.setattr(DataFrame, "collect", orig_collect)
    monkeypatch.setattr(pq_mod, "ParquetFile", orig_pf)

    assert driver_footers == []
    assert collected and max(collected) <= 3, (
        f"driver collected {max(collected)} rows — file-count-sized, "
        "not part-sized"
    )
    m = read_manifest(t, v)
    assert m["op"] == "analyze" and "files_parts" in m
    assert m["adds"] == [] and m["removes"] == []
    segs = m["files_parts"]["segments"]
    assert len([s for s in segs if "part" in s]) == 3  # ceil(10/4)
    # self-contained like a checkpoint: every bounded walk anchors here
    for k in (
        "txns", "constraints", "properties", "column_mapping",
        "identity", "row_tracking", "schema",
    ):
        assert k in m, f"full-list analyze manifest missing {k}"
    assert tx.resolve_row_tracking(t) == rt_before
    # stats landed: every entry carries bounds, pruning is exact
    for e in tx.resolve_files(t):
        assert "doc_id" in (e.get("stats") or {})
    df, stats = snapshot_pruned(spark, t, "doc_id", lo=300, hi=305)
    assert stats["files_skipped"] == 9 and stats["files_read"] == 1
    assert df.count() == 6
    assert sorted(map(tuple, snapshot(spark, t).collect())) == before
    # the chain keeps working past the parts checkpoint
    append(spark, t, _seed(spark, 5, offset=2000).coalesce(1))
    assert snapshot(spark, t).count() == 105


def test_analyze_parts_rebases_over_blind_append(
    spark, tmp_path, monkeypatch
):
    """A lost claim race against a BLIND APPEND rebases without
    re-reading footers: the raced-in file rides into one extra
    (stats-free, always-probed) part segment — the delta path's exact
    rebase semantics at parts scale."""
    t = str(tmp_path / "anrace")
    init_table(spark, t, _seed(spark, 10).coalesce(1))
    for i in range(7):
        append(
            spark, t, _seed(spark, 10, offset=100 * (i + 1)).coalesce(1)
        )
    monkeypatch.setattr(tx, "PARQUET_CHECKPOINT_MIN", 6)
    orig_claim = tx._claim
    state = {"raced": False}

    def racing_claim(table_dir, version, payload):
        if not state["raced"]:
            state["raced"] = True
            append(
                spark, t, _seed(spark, 10, offset=5000).coalesce(1)
            )
        return orig_claim(table_dir, version, payload)

    monkeypatch.setattr(tx, "_claim", racing_claim)
    v = analyze_table(spark, t, ["doc_id"])
    monkeypatch.setattr(tx, "_claim", orig_claim)
    assert v == current_version(t)
    entries = tx.resolve_files(t)
    assert len(entries) == 9
    for e in entries:
        ents_stats = e.get("stats") or {}
        lo = 5000 <= (e.get("stats", {}).get("doc_id") or [0])[0]
        if lo:
            # the raced-in file would carry write-time stats only if
            # appends track the col — this table tracks nothing, so
            # the rebased entry must be stats-FREE (always probed)
            assert "doc_id" not in ents_stats
    raced = [
        e
        for e in entries
        if "doc_id" not in (e.get("stats") or {})
    ]
    assert len(raced) == 1
    # pruning stays EXACT: the stats-free file is always probed
    df, stats = snapshot_pruned(spark, t, "doc_id", lo=5000, hi=5005)
    assert stats["files_read"] == 1 and stats["files_skipped"] == 8
    assert df.count() == 6
    assert snapshot(spark, t).count() == 90
