"""Incremental clustering maintenance (`cluster_table`) — the
liquid-clustering shape: only files not stamped with the CURRENT
cluster spec rewrite; steady ingest pays for its churn, never the
table. Declared via the cluster.by property (SQL: ALTER TABLE ...
CLUSTER BY), driven by maintain_table."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from etl_sentinel_imagery_spark.operators import txlog as tx
from etl_sentinel_imagery_spark.operators.txlog import (
    append,
    cluster_table,
    current_version,
    init_table,
    maintain_table,
    resolve_files,
    set_properties,
    snapshot,
    table_changes,
)
from etl_sentinel_imagery_spark.operators.txlog_sql import tx_sql


def _seed(spark, n=200, offset=0):
    # two independent dimensions so the curve has something to do
    return spark.range(offset, offset + n).select(
        F.col("id").alias("k"),
        ((F.col("id") * 37) % 1000).alias("a"),
        ((F.col("id") * 101) % 1000).alias("b"),
    )


def test_cluster_table_marks_then_noops(spark, tmp_path):
    t = str(tmp_path / "cl")
    init_table(
        spark, t, _seed(spark, 400).repartition(4), stat_cols=["a", "b"]
    )
    want = sorted(map(tuple, snapshot(spark, t).collect()))

    v, stats = cluster_table(spark, t, cols=["a", "b"], target_bytes=4000)
    assert stats["files_clustered"] == 4
    assert stats["files_written"] >= 2
    entries = resolve_files(t)
    assert all(e.get("clustered") == "a,b" for e in entries)
    assert sorted(map(tuple, snapshot(spark, t).collect())) == want
    # content-neutral rewrite: the feed skips it
    assert table_changes(spark, t, v - 1).count() == 0

    # second pass: everything carries the spec → version unchanged
    v2, stats2 = cluster_table(spark, t, cols=["a", "b"])
    assert v2 == v and stats2["files_clustered"] == 0


def test_cluster_table_is_incremental_on_churn(spark, tmp_path):
    t = str(tmp_path / "cli")
    init_table(spark, t, _seed(spark, 300).repartition(3))
    cluster_table(spark, t, cols=["a"], target_bytes=4000)
    stable = {
        tx._entry_name(e)
        for e in resolve_files(t)
        if e.get("clustered") == "a"
    }
    append(spark, t, _seed(spark, 50, offset=1000).coalesce(1))
    append(spark, t, _seed(spark, 50, offset=2000).coalesce(1))

    v, stats = cluster_table(spark, t, cols=["a"], target_bytes=10**9)
    assert stats["files_clustered"] == 2  # ONLY the churn
    after = resolve_files(t)
    # previously clustered generations are untouched (same names)
    assert stable <= {tx._entry_name(e) for e in after}
    assert all(e.get("clustered") == "a" for e in after)
    assert snapshot(spark, t).count() == 400

    # a spec CHANGE re-marks everything stale → full recluster
    v2, stats2 = cluster_table(spark, t, cols=["b"], target_bytes=10**9)
    assert stats2["files_clustered"] == len(after)
    assert all(e.get("clustered") == "b" for e in resolve_files(t))


def test_clustering_narrows_per_file_stats(spark, tmp_path):
    """The point of the curve: each output file covers a narrow range
    of every clustered column, so manifest stats prune range scans."""
    t = str(tmp_path / "cln")
    init_table(
        spark, t, _seed(spark, 2000).repartition(4), stat_cols=["a"]
    )
    spans_before = [
        e["stats"]["a"][1] - e["stats"]["a"][0]
        for e in resolve_files(t)
    ]
    cluster_table(spark, t, cols=["a"], target_bytes=8000)
    after = resolve_files(t)
    assert len(after) >= 4
    spans_after = [
        e["stats"]["a"][1] - e["stats"]["a"][0] for e in after
    ]
    # unclustered round-robin files each span ~the full domain;
    # clustered files must be dramatically narrower on average
    assert sum(spans_after) / len(spans_after) < 0.5 * (
        sum(spans_before) / len(spans_before)
    )


def test_cluster_by_sql_and_maintain_table(spark, tmp_path):
    t = str(tmp_path / "clm")
    init_table(spark, t, _seed(spark, 200).repartition(2))
    tx_sql(spark, f"ALTER TABLE `{t}` CLUSTER BY (a, b)")
    assert tx.resolve_properties(t)["cluster.by"] == "a,b"
    import pytest

    with pytest.raises(Exception, match="unknown column"):
        tx_sql(spark, f"ALTER TABLE `{t}` CLUSTER BY (nope)")

    report = maintain_table(spark, t, vacuum_min_age_seconds=10**9)
    assert report["files_clustered"] == 2
    assert all(
        e.get("clustered") == "a,b" for e in resolve_files(t)
    )
    # converged: the next nightly no-ops
    report2 = maintain_table(spark, t, vacuum_min_age_seconds=10**9)
    assert report2["files_clustered"] == 0

    tx_sql(spark, f"ALTER TABLE `{t}` CLUSTER BY NONE")
    assert "cluster.by" not in tx.resolve_properties(t)


def test_cluster_survives_partitioned_layout(spark, tmp_path):
    t = str(tmp_path / "clp")
    df = _seed(spark, 300).withColumn(
        "grp", (F.col("k") % 3).cast("int")
    )
    init_table(
        spark, t, df.repartition(3), partition_cols=["grp"]
    )
    v, stats = cluster_table(spark, t, cols=["a"], target_bytes=4000)
    snap = snapshot(spark, t)
    assert snap.count() == 300
    assert snap.groupBy("grp").count().count() == 3
    # rows stayed in their hive leaves
    for e in resolve_files(t):
        assert tx._entry_name(e).startswith("grp=")


def test_cluster_materializes_dv_debt_in_one_pass(spark, tmp_path):
    """Fusion: a clustered file that later gained deletion vectors
    re-enters the candidate set — ONE rewrite materializes the soft
    deletes and keeps the spec marker (no second rewrite the next
    nightly; DV-free stamped files stay untouched)."""
    from etl_sentinel_imagery_spark.operators.txlog import (
        delete_rows_dv,
    )

    t = str(tmp_path / "clf")
    init_table(spark, t, _seed(spark, 200).repartition(2))
    cluster_table(spark, t, cols=["a"], target_bytes=10**9)
    delete_rows_dv(spark, t, "k", [5, 6, 7])
    dv_files = [
        tx._entry_name(e)
        for e in resolve_files(t)
        if tx._entry_dvs(e)
    ]
    assert dv_files  # the delete left soft-deleted positions
    clean = {
        tx._entry_name(e)
        for e in resolve_files(t)
        if not tx._entry_dvs(e)
    }

    v, stats = cluster_table(spark, t, cols=["a"], target_bytes=10**9)
    assert stats["files_clustered"] == len(dv_files)
    after = resolve_files(t)
    assert clean <= {tx._entry_name(e) for e in after}  # untouched
    assert all(not tx._entry_dvs(e) for e in after)  # debt gone
    assert all(e.get("clustered") == "a" for e in after)  # marker kept
    assert snapshot(spark, t).count() == 197
    # converged: third pass no-ops
    v2, stats2 = cluster_table(spark, t, cols=["a"])
    assert v2 == v and stats2["files_clustered"] == 0


def test_create_table_cluster_by(spark, tmp_path):
    """CREATE TABLE ... CLUSTER BY records the spec at birth (both the
    schema-list and AS-select forms); the first maintenance pass
    clusters; unknown columns refuse."""
    import pytest

    t = str(tmp_path / "ccb")
    tx_sql(
        spark,
        f"CREATE TABLE `{t}` (k long, a long) CLUSTER BY (a)",
    )
    assert tx.resolve_properties(t)["cluster.by"] == "a"

    _seed(spark, 100).createOrReplaceTempView("ccb_src")
    t2 = str(tmp_path / "ccb2")
    tx_sql(
        spark,
        f"CREATE TABLE `{t2}` CLUSTER BY (a, b) AS "
        "SELECT * FROM ccb_src",
    )
    assert tx.resolve_properties(t2)["cluster.by"] == "a,b"
    report = maintain_table(spark, t2, vacuum_min_age_seconds=10**9)
    assert all(
        e.get("clustered") == "a,b" for e in resolve_files(t2)
    )
    assert snapshot(spark, t2).count() == 100

    with pytest.raises(Exception, match="unknown columns"):
        tx_sql(
            spark,
            f"CREATE TABLE `{tmp_path / 'x'}` (k long) CLUSTER BY (z)",
        )
