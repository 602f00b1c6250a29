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
