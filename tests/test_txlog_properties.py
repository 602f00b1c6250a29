"""TABLE PROPERTIES + policy-driven maintenance.

Operational config (retention windows, maintenance thresholds) lives
WITH the table in the manifest chain — Delta's TBLPROPERTIES — so a
fleet-wide maintenance cron needs zero per-table configuration:
``maintain_table`` reads every threshold from the table itself.
Properties ride checkpoints, truncate horizons and shallow clones like
constraints/mapping; a RESTORE deliberately does NOT rewind them (a
data rollback silently shortening the vacuum window would be a trap).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from etl_sentinel_imagery_spark.operators import txlog as tx
from etl_sentinel_imagery_spark.operators.txlog import (
    append,
    compact_dvs,
    current_version,
    delete_rows_dv,
    init_table,
    maintain_table,
    resolve_properties,
    restore,
    set_properties,
    snapshot,
    truncate_history,
    vacuum,
)


def _seed(spark, n=40, offset=0):
    return spark.range(offset, offset + n).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 5).cast("int").alias("grp"),
        F.concat(F.lit("pr-"), F.col("id")).alias("body"),
    )


def test_set_unset_and_free_form_keys(spark, tmp_path):
    t = str(tmp_path / "p")
    init_table(spark, t, _seed(spark, 10).coalesce(1))
    v = set_properties(t, {"team.owner": "data-eng", "dv.max_chain": 2})
    assert v == current_version(t)
    assert resolve_properties(t) == {
        "team.owner": "data-eng",
        "dv.max_chain": 2,
    }
    set_properties(t, {"team.owner": None, "retention.min_age_seconds": 0})
    assert resolve_properties(t) == {
        "dv.max_chain": 2,
        "retention.min_age_seconds": 0,
    }
    # pre-properties versions answer empty
    assert resolve_properties(t, 0) == {}
    with pytest.raises(ValueError):
        set_properties(t, {"bad": {"nested": 1}})


def test_properties_drive_engine_defaults(spark, tmp_path):
    t = str(tmp_path / "pd")
    init_table(spark, t, _seed(spark, 40).coalesce(1))
    set_properties(
        t, {"dv.max_chain": 2, "retention.min_age_seconds": 0}
    )
    # grow a 3-link DV chain: beyond the table's OWN bound of 2
    for k in (1, 2, 3):
        delete_rows_dv(spark, t, "doc_id", [k])
    v0 = current_version(t)
    compact_dvs(spark, t)  # no explicit max_chain
    assert current_version(t) == v0 + 1
    entry = next(e for e in tx.resolve_files(t) if tx._entry_dvs(e))
    assert len(entry["dv"]) == 1 and entry["dv_n"] == 3
    # retention property: an orphan sweeps with NO explicit opt-in
    orphan = os.path.join(t, "orphan.parquet")
    with open(orphan, "wb") as f:
        f.write(b"junk")
    assert "orphan.parquet" in vacuum(t)
    assert snapshot(spark, t).count() == 37


def test_properties_survive_truncate_and_clone_not_restore(
    spark, tmp_path
):
    t = str(tmp_path / "pt")
    init_table(spark, t, _seed(spark, 20).coalesce(1))
    v_before_props = current_version(t)
    set_properties(t, {"retention.min_age_seconds": 123})
    for i in range(3):
        append(spark, t, _seed(spark, 2, offset=100 + i * 10).coalesce(1))
    # restore across the set_properties commit: data rolls back,
    # properties do NOT rewind
    restore(spark, t, v_before_props)
    assert snapshot(spark, t).count() == 20
    assert resolve_properties(t) == {"retention.min_age_seconds": 123}
    # truncate: the self-contained horizon carries the map
    truncate_history(t, keep_versions=1)
    assert resolve_properties(t) == {"retention.min_age_seconds": 123}
    # clone: operational config travels with the table
    dest = str(tmp_path / "pt-clone")
    tx.clone_table(t, dest)
    assert resolve_properties(dest) == {
        "retention.min_age_seconds": 123
    }


def test_maintain_table_one_call_policy(spark, tmp_path):
    t = str(tmp_path / "mt")
    # many small files + DV chains + an orphan: the nightly-cron shape
    init_table(spark, t, _seed(spark, 60).repartition(6))
    set_properties(
        t,
        {
            "dv.max_chain": 1,
            "optimize.small_bytes": 10**9,
            "optimize.target_bytes": 10**9,
            "retention.min_age_seconds": 0,
        },
    )
    # two sequential deletes on keys KNOWN to share a file -> a 2-link
    # chain on that entry, over the table's own dv.max_chain=1
    by_file: dict = {}
    for r in (
        spark.read.parquet(t)
        .select("doc_id", F.col("_metadata.file_path").alias("fp"))
        .collect()
    ):
        by_file.setdefault(r["fp"], []).append(r["doc_id"])
    k1, k2 = next(v for v in by_file.values() if len(v) >= 2)[:2]
    delete_rows_dv(spark, t, "doc_id", [k1])
    delete_rows_dv(spark, t, "doc_id", [k2])
    with open(os.path.join(t, "orphan.parquet"), "wb") as f:
        f.write(b"junk")
    before = sorted(map(tuple, snapshot(spark, t).collect()))
    report = maintain_table(spark, t)
    assert report["dv_chains_folded"] is True
    assert report["files_rewritten"] > 0
    assert report["files_written"] < report["files_rewritten"]
    assert report["orphans_reclaimed"] >= 1
    assert sorted(map(tuple, snapshot(spark, t).collect())) == before
    # DVs are materialized away and chains gone
    assert all(not tx._entry_dvs(e) for e in tx.resolve_files(t))
    # a healthy table no-ops: no new versions, nothing reclaimed
    v = current_version(t)
    report2 = maintain_table(spark, t)
    assert report2["versions"] == []
    assert current_version(t) == v


def test_drop_partition_is_metadata_only(spark, tmp_path):
    """Dropping a hive partition is one commit selected from manifest
    paths — no probe, no DV, no file IO; time travel and the change
    feed stay exact; vacuum after truncation reclaims the leaf."""
    from etl_sentinel_imagery_spark.operators.txlog import (
        drop_partition,
        table_changes,
        truncate_history,
    )

    t = str(tmp_path / "dp")
    init_table(
        spark,
        t,
        _seed(spark, 50).repartition(4),
        partition_cols=["grp"],
    )
    v0 = current_version(t)
    n_grp2 = snapshot(spark, t).where("grp = 2").count()
    assert n_grp2 > 0
    v = drop_partition(t, {"grp": 2})
    assert v == v0 + 1
    snap = snapshot(spark, t)
    assert snap.where("grp = 2").count() == 0
    assert snap.count() == 50 - n_grp2
    # time travel still serves the dropped partition
    assert (
        snapshot(spark, t, version=v0).where("grp = 2").count()
        == n_grp2
    )
    # the feed emits exactly the dropped rows as deletes
    feed = table_changes(spark, t, v0, v)
    assert feed.count() == n_grp2
    assert set(
        r["_change_type"] for r in feed.select("_change_type").collect()
    ) == {"delete"}
    # refusals: non-partition column; whole-table disguise
    with pytest.raises(ValueError, match="not a partition column"):
        drop_partition(t, {"doc_id": 1})
    # no-op on an absent value
    assert drop_partition(t, {"grp": 99}) == v
    # retention composes: truncate + vacuum reclaims the leaf's files
    truncate_history(t, keep_versions=0)
    removed = vacuum(t, min_age_seconds=0)
    assert any("grp=2" in r for r in removed)
    assert snapshot(spark, t).count() == 50 - n_grp2


def test_drop_partition_refuses_whole_table(spark, tmp_path):
    from etl_sentinel_imagery_spark.operators.txlog import (
        drop_partition,
    )

    t = str(tmp_path / "dpw")
    init_table(
        spark,
        t,
        _seed(spark, 10).where("grp = 1").repartition(1),
        partition_cols=["grp"],
    )
    with pytest.raises(ValueError, match="whole-table"):
        drop_partition(t, {"grp": 1})


def test_vacuum_dry_run_reports_without_deleting(spark, tmp_path):
    t = str(tmp_path / "vdr")
    init_table(spark, t, _seed(spark, 10).coalesce(1))
    orphan = os.path.join(t, "orphan.parquet")
    with open(orphan, "wb") as f:
        f.write(b"junk")
    would = vacuum(t, min_age_seconds=0, dry_run=True)
    assert would == ["orphan.parquet"]
    assert os.path.exists(orphan)  # nothing touched
    assert vacuum(t, min_age_seconds=0) == ["orphan.parquet"]
    assert not os.path.exists(orphan)


def test_maintain_table_backfills_stats_from_property(
    spark, tmp_path
):
    """A table opting into analyze.cols gains pruning on its next
    maintenance pass — and the pass is idempotent (already-tracked
    columns are skipped)."""
    from etl_sentinel_imagery_spark.operators.txlog import (
        snapshot_pruned,
    )

    t = str(tmp_path / "anp")
    init_table(spark, t, _seed(spark, 20).coalesce(1))
    append(spark, t, _seed(spark, 20, offset=100).coalesce(1))
    set_properties(
        t,
        {
            "analyze.cols": "doc_id",
            "retention.min_age_seconds": 0,
            # keep the two files distinct: the point under test is
            # pruning via backfilled stats, not the bin-packer
            "optimize.small_bytes": 1,
        },
    )
    rep = maintain_table(spark, t)
    assert rep["analyzed_cols"] == ["doc_id"]
    _, stats = snapshot_pruned(spark, t, "doc_id", lo=100, hi=105)
    assert stats["files_skipped"] == 1
    rep2 = maintain_table(spark, t)
    assert rep2["analyzed_cols"] == []


def test_maintain_table_syncs_declared_indexes(spark, tmp_path):
    """Round-7 verdict #8: a table property (`index.dirs`) declares the
    serving indexes derived from this table, and the ONE-CALL ladder
    converges them — analyze → fold → bin-pack → vacuum → index sync +
    layout vacuum — with no explicit sync call and no scheduler-side
    bookkeeping. A declared index whose cursor names a different
    source table refuses loudly."""
    from etl_sentinel_imagery_spark.plans.serving import (
        build_index_from_table,
    )

    def vecs(ids, shift=0.0):
        rows = [
            (
                int(i),
                [
                    float((i * 7 + d * 3) % 11) / 11.0 + shift
                    for d in range(4)
                ],
            )
            for i in ids
        ]
        return spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        )

    def corpus(idx):
        from etl_sentinel_imagery_spark.operators.similarity import (
            read_indexed_layout,
        )

        return sorted(
            (r["vec_id"], tuple(round(x, 9) for x in r["embedding"]))
            for r in read_indexed_layout(spark, os.path.join(idx, "ivf"))
            .select("vec_id", "embedding")
            .collect()
        )

    t = str(tmp_path / "embm")
    init_table(spark, t, vecs(range(40)).coalesce(2))
    idx = str(tmp_path / "idxm")
    build_index_from_table(spark, t, idx, n_centroids=3, hnsw=False)
    set_properties(
        t, {"index.dirs": idx, "retention.min_age_seconds": 0}
    )

    append(spark, t, vecs(range(100, 110)).coalesce(1))
    delete_rows_dv(spark, t, "vec_id", [2, 4, 105])
    rep = maintain_table(spark, t)
    assert len(rep["index_syncs"]) == 1
    sync = rep["index_syncs"][0]
    # 9 surviving appends; deletes count the netted changes (2, 4, and
    # the appended-then-deleted 105, which nets to a harmless delete)
    assert sync["upserts"] == 9 and sync["deletes"] == 3
    # the declared index converged WITHOUT an explicit sync call
    want = sorted(
        (r["vec_id"], tuple(round(x, 9) for x in r["embedding"]))
        for r in snapshot(spark, t).collect()
    )
    assert corpus(idx) == want
    # retention 0: the rewrite's retired generation swept in the same
    # ladder pass
    assert sync["layout_files_reclaimed"] >= 1

    # idempotent: a second ladder run syncs nothing
    rep2 = maintain_table(spark, t)
    assert rep2["index_syncs"][0]["upserts"] == 0

    # wrong-table declaration refuses instead of draining a foreign feed
    t2 = str(tmp_path / "other")
    init_table(spark, t2, vecs(range(10)).coalesce(1))
    idx2 = str(tmp_path / "idxother")
    build_index_from_table(spark, t2, idx2, n_centroids=2, hnsw=False)
    set_properties(t, {"index.dirs": f"{idx},{idx2}"})
    with pytest.raises(ValueError, match="wrong change feed"):
        maintain_table(spark, t)


def test_maintain_table_syncs_index_with_custom_columns(spark, tmp_path):
    """Round-8 ADVICE (medium): the sync cursor records the id/vector
    COLUMN NAMES the index was built over, so the nightly ladder (and
    any bare sync call) resolves them from the cursor instead of
    assuming vec_id/embedding — an index over differently-named
    columns used to throw mid-ladder, after compaction/vacuum had
    already run, losing the report. An explicit mismatching override
    refuses loudly."""
    from etl_sentinel_imagery_spark.plans.serving import (
        build_index_from_table,
        sync_index_from_table,
    )

    def vecs(ids, shift=0.0):
        rows = [
            (
                int(i),
                [
                    float((i * 7 + d * 3) % 11) / 11.0 + shift
                    for d in range(4)
                ],
            )
            for i in ids
        ]
        return spark.createDataFrame(
            rows, "doc_id long, vec array<double>"
        )

    t = str(tmp_path / "embc")
    init_table(spark, t, vecs(range(40)).coalesce(2))
    idx = str(tmp_path / "idxc")
    build_index_from_table(
        spark, t, idx, n_centroids=3, hnsw=False,
        id_col="doc_id", vec_col="vec",
    )
    set_properties(t, {"index.dirs": idx})

    append(spark, t, vecs(range(100, 108)).coalesce(1))
    delete_rows_dv(spark, t, "doc_id", [1, 3])
    rep = maintain_table(spark, t)
    assert len(rep["index_syncs"]) == 1
    assert rep["index_syncs"][0]["upserts"] == 8
    assert rep["index_syncs"][0]["deletes"] == 2

    from etl_sentinel_imagery_spark.operators.similarity import (
        read_indexed_layout,
    )

    got = sorted(
        r["doc_id"]
        for r in read_indexed_layout(spark, os.path.join(idx, "ivf"))
        .select("doc_id")
        .collect()
    )
    want = sorted(r["doc_id"] for r in snapshot(spark, t).collect())
    assert got == want

    # an explicit override that contradicts the build refuses loudly
    # BEFORE touching any tier
    with pytest.raises(ValueError, match="built with id_col"):
        sync_index_from_table(spark, t, idx, id_col="vec_id")
    # matching explicit columns still accepted (back-compat callers)
    rep2 = sync_index_from_table(
        spark, t, idx, id_col="doc_id", vec_col="vec"
    )
    assert rep2["upserts"] == 0


def test_sync_honors_explicit_columns_on_legacy_cursor(spark, tmp_path):
    """Back-compat: an index built BEFORE the cursor recorded its
    columns (round-9) has only the caller's explicit id_col/vec_col to
    go on — they must be honored, not rejected against the defaults."""
    import json

    from etl_sentinel_imagery_spark.plans.serving import (
        build_index_from_table,
        sync_index_from_table,
    )

    def vecs(ids, shift=0.0):
        rows = [
            (
                int(i),
                [
                    float((i * 7 + d * 3) % 11) / 11.0 + shift
                    for d in range(4)
                ],
            )
            for i in ids
        ]
        return spark.createDataFrame(
            rows, "doc_id long, vec array<double>"
        )

    t = str(tmp_path / "leg")
    init_table(spark, t, vecs(range(30)).coalesce(1))
    idx = str(tmp_path / "idxleg")
    build_index_from_table(
        spark, t, idx, n_centroids=2, hnsw=False,
        id_col="doc_id", vec_col="vec",
    )
    # simulate a pre-round-9 cursor: strip the recorded columns
    cur = os.path.join(idx, "_table_sync.json")
    with open(cur) as f:
        c = json.load(f)
    c.pop("id_col"), c.pop("vec_col")
    with open(cur, "w") as f:
        json.dump(c, f)

    append(spark, t, vecs(range(50, 55)).coalesce(1))
    rep = sync_index_from_table(
        spark, t, idx, id_col="doc_id", vec_col="vec"
    )
    assert rep["upserts"] == 5


def test_auto_compact_property_triggers_inline(spark, tmp_path):
    """optimize.auto_compact: micro-appends self-heal once the live
    small-file count reaches auto_compact_min_files — no nightly job
    needed; OFF tables never pay it."""
    from etl_sentinel_imagery_spark.operators.txlog import (
        append,
        init_table,
        resolve_files,
        set_properties,
        snapshot,
    )

    def seed(n, off=0):
        return spark.range(off, off + n).select(
            F.col("id").alias("k"), (F.col("id") * 3).alias("v")
        )

    t = str(tmp_path / "ac")
    init_table(spark, t, seed(5).coalesce(1))
    # OFF: files accumulate
    for i in range(4):
        append(spark, t, seed(5, 100 + 5 * i).coalesce(1))
    assert len(resolve_files(t)) == 5

    set_properties(
        t,
        {
            "optimize.auto_compact": "true",
            "optimize.auto_compact_min_files": 6,
        },
    )
    append(spark, t, seed(5, 200).coalesce(1))  # 6th file: triggers
    assert len(resolve_files(t)) == 1
    assert snapshot(spark, t).count() == 30
    # below threshold again: appends stay cheap, no rewrite storm
    append(spark, t, seed(5, 300).coalesce(1))
    assert len(resolve_files(t)) == 2
