"""CONVERT TO TXLOG (in-place adoption of an existing parquet
directory — zero data IO, Delta's CONVERT TO DELTA) and REORG TABLE
... APPLY (PURGE) (materialize deletion vectors into physical
absence), plus the exact DV keying they forced: converted directories
legally reuse one basename across partition leaves (Spark's own
partitioned writes do), so deletion vectors key on the FULL recorded
entry name, never the basename.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from etl_sentinel_imagery_spark.operators.txlog import (
    TxConflict,
    append,
    clone_table,
    compact_dvs,
    convert_to_txlog,
    current_version,
    delete_where,
    merge,
    resolve_files,
    snapshot,
    snapshot_partition,
    snapshot_pruned,
    table_changes,
    _entry_dvs,
    _entry_name,
)
from etl_sentinel_imagery_spark.operators.txlog_sql import (
    TxSqlError,
    tx_sql,
)


def _ids(spark, d, version=None):
    return sorted(r["id"] for r in snapshot(spark, d, version).collect())


# ------------------------------------------------------------------ convert


def test_convert_plain_dir_adopts_in_place(spark, tmp_path):
    d = str(tmp_path / "plain")
    # range-partitioned files so stats pruning has something to skip
    spark.range(0, 300).select(
        F.col("id"), (F.col("id") * 2).alias("v")
    ).repartitionByRange(3, "id").write.parquet(d)
    raw_files = sorted(
        f for f in os.listdir(d) if f.endswith(".parquet")
    )
    v = convert_to_txlog(spark, d, stat_cols=["id"])
    assert v == 0
    # zero data movement: the adopted files are the SAME files
    assert sorted(
        _entry_name(e) for e in resolve_files(d)
    ) == raw_files
    assert _ids(spark, d) == list(range(300))
    # footer stats landed → metadata file skipping works
    df, st = snapshot_pruned(spark, d, "id", lo=0, hi=10)
    assert st["files_skipped"] >= 1 and df.count() == 11
    # the table is fully writable from v0 on
    append(spark, d, spark.range(300, 310).select(
        F.col("id"), (F.col("id") * 2).alias("v")
    ))
    delete_where(spark, d, "id < 5")
    assert _ids(spark, d) == list(range(5, 310))
    assert _ids(spark, d, version=0) == list(range(300))  # time travel


def test_convert_hive_dir_duplicate_basenames_dv_exact(spark, tmp_path):
    """The forcing case: Spark's partitioned write reuses each task's
    basename across partition leaves; DV deletes must stay file-exact
    (the old basename keying deleted a twin file's rows too)."""
    d = str(tmp_path / "hive")
    vals = ["a:b", "c d", "plain"]  # escaped values too
    spark.createDataFrame(
        [(i, vals[i % 3]) for i in range(60)], "id int, grp string"
    ).repartition(2).write.partitionBy("grp").parquet(d)
    # duplicate basenames across leaves are the norm, assert the
    # fixture really has them
    names = [
        os.path.relpath(os.path.join(r, f), d)
        for r, _dirs, fs in os.walk(d)
        for f in fs
        if f.endswith(".parquet") and not f.startswith(("_", "."))
    ]
    bases = [os.path.basename(n) for n in names]
    assert len(set(bases)) < len(bases), "fixture lost its twin names"

    convert_to_txlog(spark, d)
    assert _ids(spark, d) == list(range(60))
    # partition column round-trips typed + escaped
    dfp, st = snapshot_partition(spark, d, {"grp": "a:b"})
    assert dfp.count() == 20 and st["files_read"] < st["files_total"]

    delete_where(spark, d, "id < 12")
    assert _ids(spark, d) == list(range(12, 60))

    # merge upsert on the converted table: updates + inserts exact
    src = spark.createDataFrame(
        [(12, "a:b"), (999, "plain")], "id int, grp string"
    )
    merge(spark, d, src, "id")
    assert _ids(spark, d) == list(range(12, 60)) + [999]

    # the adopted v0 behaves like an init in the feed: from_version=-1
    # emits every adopted row as an insert
    full = table_changes(spark, d, -1)
    assert (
        full.filter(F.col("_change_type") == "insert").count() >= 60
    )

    # the change feed's DV position reader takes the same exact path
    feed = table_changes(spark, d, 0)
    dels = feed.filter(F.col("_change_type") == "delete")
    assert sorted(
        r["id"] for r in dels.collect()
    ) == list(range(12))  # the merge only updated/inserted


def test_convert_refusals_and_edge_cases(spark, tmp_path):
    d = str(tmp_path / "r1")
    spark.range(5).write.parquet(d)
    convert_to_txlog(spark, d)
    with pytest.raises(TxConflict, match="already a txlog table"):
        convert_to_txlog(spark, d)

    empty = str(tmp_path / "r2")
    os.makedirs(empty)
    with pytest.raises(ValueError, match="no parquet data files"):
        convert_to_txlog(spark, empty)

    # inconsistent layout: bare file beside a hive leaf
    mixed = str(tmp_path / "r3")
    spark.range(4).write.parquet(mixed)
    spark.createDataFrame([(1, "x")], "id long, grp string").write.mode(
        "append"
    ).partitionBy("grp").parquet(mixed)
    with pytest.raises(ValueError, match="inconsistent hive layout"):
        convert_to_txlog(spark, mixed)

    # partition assertion mismatch
    hive = str(tmp_path / "r4")
    spark.createDataFrame(
        [(1, "x"), (2, "y")], "id long, grp string"
    ).write.partitionBy("grp").parquet(hive)
    with pytest.raises(ValueError, match="asserted"):
        convert_to_txlog(spark, hive, partition_cols=["other"])
    convert_to_txlog(spark, hive, partition_cols=["grp"])
    assert snapshot(spark, hive).count() == 2


def test_convert_sql_twin_and_zero_row_files(spark, tmp_path):
    d = str(tmp_path / "sqlconv")
    # a sparse write leaves schema-only empty part files behind
    spark.range(0, 50).select(
        F.col("id"), (F.col("id") % 2).alias("v")
    ).repartition(8).filter(F.col("id") < 10).write.parquet(d)
    on_disk = [
        f for f in os.listdir(d)
        if f.endswith(".parquet") and not f.startswith("_")
    ]
    v = tx_sql(spark, f"CONVERT TO TXLOG `{d}`", None)
    assert v == 0
    adopted = [_entry_name(e) for e in resolve_files(d)]
    # zero-row files stay on disk but are not adopted
    assert all(e["rows"] > 0 for e in resolve_files(d))
    assert len(adopted) <= len(on_disk)
    assert snapshot(spark, d).count() == 10


# -------------------------------------------------------------------- reorg


def _dv_entries(d):
    return [e for e in resolve_files(d) if _entry_dvs(e)]


def test_reorg_purge_materializes_dvs(spark, tmp_path):
    d = str(tmp_path / "reorg")
    spark.createDataFrame(
        [(i, ["x", "y"][i % 2]) for i in range(80)], "id int, grp string"
    ).repartition(2).write.partitionBy("grp").parquet(d)
    convert_to_txlog(spark, d)
    delete_where(spark, d, "id < 20")
    pre = _ids(spark, d)
    assert len(_dv_entries(d)) > 0
    v_pre = current_version(d)

    ver, st = tx_sql(spark, "REORG TABLE t APPLY (PURGE)", {"t": d})
    assert ver == v_pre + 1
    assert st["files_rewritten"] > 0
    # DVs are gone, rows identical, time travel preserved
    assert _dv_entries(d) == []
    assert _ids(spark, d) == pre
    assert _ids(spark, d, version=v_pre) == pre
    assert snapshot(spark, d, 0).count() == 80
    # content-neutral: the change feed skips the rewrite commit
    feed = table_changes(spark, d, v_pre)
    assert feed.count() == 0

    # idempotent: nothing left to purge
    ver2, st2 = tx_sql(spark, "REORG TABLE t APPLY (PURGE)", {"t": d})
    assert ver2 == ver and st2["files_rewritten"] == 0


def test_reorg_scoped_and_grammar(spark, tmp_path):
    d = str(tmp_path / "reorg2")
    spark.createDataFrame(
        [(i, ["x", "y"][i % 2]) for i in range(40)], "id int, grp string"
    ).coalesce(1).write.partitionBy("grp").parquet(d)
    convert_to_txlog(spark, d)
    delete_where(spark, d, "id < 8")
    # scope to one leaf: only grp=x files purge, grp=y keeps its DV
    _ver, st = tx_sql(
        spark, "REORG TABLE t WHERE grp = 'x' APPLY (PURGE)", {"t": d}
    )
    assert st["files_rewritten"] >= 1
    left = {
        _entry_name(e).split(os.sep)[0] for e in _dv_entries(d)
    }
    assert left == {"grp=y"}
    assert _ids(spark, d) == list(range(8, 40))

    with pytest.raises(TxSqlError, match="APPLY"):
        tx_sql(spark, "REORG TABLE t APPLY (SHRED)", {"t": d})


# ----------------------------------------------- exact DV keying regressions


def test_dv_fold_exact_on_duplicate_basenames(spark, tmp_path):
    """compact_dv_chains used the basename filter too — fold on a
    converted table must keep per-file position sets exact."""
    d = str(tmp_path / "fold")
    spark.createDataFrame(
        [(i, ["x", "y"][i % 2]) for i in range(40)], "id int, grp string"
    ).coalesce(1).write.partitionBy("grp").parquet(d)
    convert_to_txlog(spark, d)
    cut = set()
    for lo in (0, 4, 8, 12, 16):  # 5 deletes → chains over the bound
        delete_where(spark, d, f"id >= {lo} AND id < {lo + 2}")
        cut.update((lo, lo + 1))
    pre = _ids(spark, d)
    assert pre == [i for i in range(40) if i not in cut]
    compact_dvs(spark, d, max_chain=2)
    assert _ids(spark, d) == pre
    for e in _dv_entries(d):
        assert len(_entry_dvs(e)) == 1  # chain folded


def test_clone_dv_keying_still_exact(spark, tmp_path):
    """The clone re-rooting case the old basename join existed for:
    a shallow clone's absolute entry names still resolve the source's
    source-relative DV rows after the exact-keying change."""
    src = str(tmp_path / "src")
    # clone refuses hive layouts by design, so the re-rooting case is
    # exercised on an unpartitioned converted table
    spark.createDataFrame(
        [(i, ["x", "y"][i % 2]) for i in range(30)], "id int, grp string"
    ).repartition(2).write.parquet(src)
    convert_to_txlog(spark, src)
    delete_where(spark, src, "id < 6")
    dst = str(tmp_path / "dst")
    clone_table(src, dst)
    assert _ids(spark, dst) == list(range(6, 30))
    # writes to the clone keep working against the inherited DVs
    delete_where(spark, dst, "id >= 28")
    assert _ids(spark, dst) == list(range(6, 28))
    assert _ids(spark, src) == list(range(6, 30))  # source untouched


# ------------------------------------------- round-10 SQL completions


def test_create_table_schema_form(spark, tmp_path):
    """CREATE TABLE (col type, ...) without AS: an empty table with a
    recorded schema, immediately writable, partitionable."""
    d = str(tmp_path / "empty")
    tx_sql(
        spark,
        f"CREATE TABLE `{d}` (k INT, v STRING, grp INT) "
        "PARTITIONED BY (grp)",
        None,
    )
    assert snapshot(spark, d).count() == 0
    assert [f.name for f in snapshot(spark, d).schema.fields] == [
        "k", "v", "grp",
    ]
    tx_sql(
        spark,
        f"INSERT INTO `{d}` VALUES (1, 'a', 0), (2, 'b', 1)",
        None,
    )
    assert snapshot(spark, d).count() == 2
    with pytest.raises(TxSqlError, match="unknown columns"):
        tx_sql(
            spark,
            f"CREATE TABLE `{d}2` (k INT) PARTITIONED BY (nope)",
            None,
        )


def test_show_partitions_and_analyze_sql(spark, tmp_path):
    from etl_sentinel_imagery_spark.operators.txlog import (
        snapshot_pruned,
    )

    d = str(tmp_path / "showp")
    spark.createDataFrame(
        [(i, ["a:b", "plain"][i % 2]) for i in range(20)],
        "id int, grp string",
    ).coalesce(1).write.partitionBy("grp").parquet(d)
    convert_to_txlog(spark, d)
    parts = tx_sql(spark, "SHOW PARTITIONS t", {"t": d})
    assert parts == [{"grp": "a:b"}, {"grp": "plain"}]
    # a fully-deleted partition's value disappears
    delete_where(spark, d, "grp = 'a:b'")
    assert tx_sql(spark, "SHOW PARTITIONS t", {"t": d}) == [
        {"grp": "plain"}
    ]

    # ANALYZE backfills manifest stats on the adopted files
    tx_sql(
        spark,
        "ANALYZE TABLE t COMPUTE STATISTICS FOR COLUMNS id",
        {"t": d},
    )
    _df, st = snapshot_pruned(spark, d, "id", lo=0, hi=1)
    assert st["files_total"] >= 1 and "files_skipped" in st
