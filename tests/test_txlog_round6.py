"""Round-6 hardening regressions for the transaction log + CDF stream.

Each test pins one ADVICE/verdict finding:

- CHECK constraints survive truncate_history's self-contained horizon
  (and ride checkpoints, bounding the resolve walk);
- cdf_append_sink stays exactly-once across a crash BETWEEN delivery
  and the cursor advance when the source head moved (partial-overlap
  ranges filter by the SetTransaction watermark);
- merge_upsert pins a non-deterministic source (localCheckpoint) so
  the DV probe and the data write see one slice;
- apply_changes keeps the CDF dead-key set distributed — no
  row-sized collect ever reaches the driver;
- vacuum's default age-gates candidates (Delta's 7-day retention);
  immediate reclaim is an explicit opt-in;
- DV/merge commit paths read row totals from MANIFEST metadata, not
  per-touched-file parquet footers (with a footer fallback for
  pre-rows manifests).
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from etl_sentinel_imagery_spark.operators import txlog as tx
from etl_sentinel_imagery_spark.operators.txlog import (
    ConstraintViolation,
    add_constraint,
    append,
    apply_changes,
    current_version,
    delete_rows_dv,
    init_table,
    merge_upsert,
    read_manifest,
    resolve_constraints,
    resolve_files,
    snapshot,
    table_changes,
    truncate_history,
    vacuum,
)
from etl_sentinel_imagery_spark.streaming.cdf_source import (
    CdfCursor,
    cdf_append_sink,
    cdf_step,
    drain_table_changes,
)


def _seed(spark, n=60, offset=0):
    return spark.range(offset, offset + n).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 7).cast("int").alias("grp"),
        F.concat(F.lit("r6-"), F.col("id")).alias("body"),
    )


def test_constraints_survive_truncate_history(spark, tmp_path):
    """A constraint added BEFORE the retention horizon must still be
    enforced after truncation: the self-contained horizon manifest
    embeds the resolved constraint map (files and txns already were),
    or every later write silently goes unchecked."""
    t = str(tmp_path / "ct")
    init_table(spark, t, _seed(spark, 20))
    add_constraint(spark, t, "grp_bounded", "grp BETWEEN 0 AND 6")
    for i in range(6):
        append(spark, t, _seed(spark, 5, offset=100 + 10 * i))
    stats = truncate_history(t, keep_versions=2)
    assert stats["horizon"] > 1  # the constraint commit was retired
    horizon = read_manifest(t, stats["horizon"])
    assert horizon["parent"] is None  # self-contained
    assert horizon["constraints"] == {"grp_bounded": "grp BETWEEN 0 AND 6"}
    assert resolve_constraints(t) == {
        "grp_bounded": "grp BETWEEN 0 AND 6"
    }
    bad = spark.createDataFrame(
        [(999, 99, "oob")], ["doc_id", "grp", "body"]
    )
    with pytest.raises(ConstraintViolation, match="grp_bounded"):
        append(spark, t, bad)


def test_constraints_embedded_at_checkpoints(spark, tmp_path):
    """Every CHECKPOINT_EVERY-th commit embeds the resolved constraint
    set, so resolve_constraints' chain walk is bounded like files and
    txns — a million-commit history with one day-one constraint must
    not walk a million manifests per write."""
    t = str(tmp_path / "cc")
    init_table(spark, t, _seed(spark, 10))
    add_constraint(spark, t, "grp_bounded", "grp BETWEEN 0 AND 6")
    while current_version(t) % tx.CHECKPOINT_EVERY != 0:
        append(spark, t, _seed(spark, 2, offset=1000 + current_version(t)))
    ck = read_manifest(t, current_version(t))
    assert "files" in ck and "txns" in ck  # it IS a checkpoint
    assert ck["constraints"] == {"grp_bounded": "grp BETWEEN 0 AND 6"}
    # the walk stops at the checkpoint: resolution agrees even if every
    # pre-checkpoint manifest were gone (truncate proves that above)
    assert resolve_constraints(t) == {
        "grp_bounded": "grp BETWEEN 0 AND 6"
    }


def test_cdf_append_sink_crash_overlap_no_duplicates(spark, tmp_path):
    """Crash between process() and cursor.advance(), THEN the source
    head moves: the retried range (from_v, new_to_v] partially
    overlaps the crashed run's delivered (from_v, old_to_v]. The sink
    must deliver only the versions past its watermark — without the
    filter, versions from_v+1..old_to_v append twice and every
    additive fold over the feed is wrong."""
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    ckpt = str(tmp_path / "ckpt")
    init_table(spark, src, _seed(spark, 40))
    append(spark, src, _seed(spark, 10, offset=100))  # v1
    sink = cdf_append_sink(dst, app_id="overlap-test")
    r = cdf_step(spark, src, ckpt, sink)
    assert r == (-1, 1)
    # crash simulation: delivery happened (watermark=1) but the cursor
    # write never did — rewind it to the pre-batch value
    cursor = CdfCursor(ckpt)
    with open(cursor._path, "w") as f:
        json.dump({"version": -1}, f)
    # the source head moves before the retry
    append(spark, src, _seed(spark, 5, offset=200))  # v2
    ranges = drain_table_changes(spark, src, ckpt, sink)
    assert ranges == [(-1, 2)]
    # destination feed == one copy of every version's changes
    expect = table_changes(spark, src, -1, 2).count()
    got = snapshot(spark, dst)
    assert got.count() == expect
    # and specifically v1's rows (the crashed range's tail) are single
    assert (
        got.where(
            (F.col("_commit_version") == 1)
            & (F.col("_change_type") == "insert")
        ).count()
        == 10
    )


def test_merge_upsert_pins_nondeterministic_source(spark, tmp_path):
    """A source whose rows differ per evaluation (rand-gated) must not
    diverge between the DV probe and the data write — the pin
    (localCheckpoint) makes the probe delete exactly the pre-images of
    the rows that then insert. Without it, keys inserted but never
    probed appear twice in the snapshot."""
    t = str(tmp_path / "nd")
    init_table(spark, t, _seed(spark, 100))
    for salt in range(3):
        src = (
            spark.range(0, 100)
            .where(F.rand(seed=None) < 0.4)  # different rows per eval
            .select(
                F.col("id").alias("doc_id"),
                F.lit(salt).cast("int").alias("grp"),
                F.concat(F.lit(f"m{salt}-"), F.col("id")).alias("body"),
            )
        )
        merge_upsert(spark, t, src, "doc_id")
        snap = snapshot(spark, t)
        agg = snap.agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("doc_id").alias("nk"),
        ).collect()[0]
        assert agg["n"] == agg["nk"] == 100, (
            f"duplicate keys after merge #{salt}: "
            f"{agg['n']} rows, {agg['nk']} keys"
        )


def test_apply_changes_never_collects_row_sized_sets(
    spark, tmp_path, monkeypatch
):
    """100 TB rule (round-5 verdict #1): the CDF dead-key set must stay
    distributed. Every driver materialization inside apply_changes is
    control-plane-sized — the probe bounds row (lo/hi) and the
    per-touched-file DV counts — never a DataFrame of keys."""
    t = str(tmp_path / "nc")
    init_table(spark, t, _seed(spark, 200).repartition(4))
    ups = (
        _seed(spark, 30, offset=50)
        .withColumn("body", F.concat(F.lit("up-"), F.col("doc_id")))
        .select(
            "*",
            F.lit("insert").alias("_change_type"),
            F.lit(7).alias("_commit_version"),
            F.lit("append").alias("_commit_op"),
        )
    )
    dels = _seed(spark, 40, offset=120).select(
        "*",
        F.lit("delete").alias("_change_type"),
        F.lit(7).alias("_commit_version"),
        F.lit("delete").alias("_commit_op"),
    )
    feed = ups.unionByName(dels)

    cls = type(spark.range(1))
    collected = []
    orig = cls.collect

    def spy(self):
        collected.append([f.name for f in self.schema.fields])
        return orig(self)

    monkeypatch.setattr(cls, "collect", spy)
    apply_changes(spark, t, feed, "doc_id")
    monkeypatch.undo()
    assert collected, "the probe bounds row is a legitimate collect"
    for cols in collected:
        assert cols in (["lo", "hi"], ["file_name", "n"]), (
            f"row-sized driver materialization: {cols}"
        )
    snap = snapshot(spark, t)
    assert snap.count() == 200 - 40  # 40 dead; 30 in-place updates
    assert snap.where(F.col("doc_id").between(120, 159)).count() == 0
    assert snap.where(F.col("body").startswith("up-")).count() == 30


def test_vacuum_default_age_gates_orphans(spark, tmp_path):
    """The default must NOT reclaim young unreferenced files: a
    concurrent writer's data sits unreferenced between its staging
    move and its manifest claim, and a zero default would delete
    just-committed data in that window. Immediate reclaim is an
    explicit min_age_seconds=0 opt-in."""
    t = str(tmp_path / "vac")
    init_table(spark, t, _seed(spark, 10).coalesce(1))
    orphan = os.path.join(t, "part-orphan.parquet")
    _seed(spark, 3).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "tmp_o")
    )
    src = next(
        p
        for p in os.listdir(str(tmp_path / "tmp_o"))
        if p.endswith(".parquet")
    )
    os.replace(os.path.join(str(tmp_path / "tmp_o"), src), orphan)
    assert vacuum(t) == []  # default: 7-day retention, orphan too young
    assert os.path.exists(orphan)
    assert vacuum(t, min_age_seconds=0) == ["part-orphan.parquet"]
    assert not os.path.exists(orphan)


def test_dv_commit_reads_no_footers(spark, tmp_path, monkeypatch):
    """DV delete / merge commits take row totals from manifest entries
    (recorded at append time) — zero driver-side parquet footer opens
    at commit time (round-5 verdict #6: O(touched files) driver IO)."""
    import pyarrow.parquet as pq

    t = str(tmp_path / "nf")
    init_table(spark, t, _seed(spark, 120).repartition(3))
    for e in resolve_files(t):
        assert isinstance(e, dict) and e["rows"] > 0
    assert sum(e["rows"] for e in resolve_files(t)) == 120

    opens = []
    orig = pq.ParquetFile

    def spy(path, *a, **kw):
        opens.append(str(path))
        return orig(path, *a, **kw)

    monkeypatch.setattr(pq, "ParquetFile", spy)
    delete_rows_dv(spark, t, "doc_id", [3, 50, 99])
    assert opens == [], f"driver footer reads at DV commit: {opens}"
    monkeypatch.undo()
    assert snapshot(spark, t).count() == 117


def test_dv_commit_footer_fallback_for_old_manifests(spark, tmp_path):
    """Back-compat: entries written before row counts landed (no
    'rows' key) fall back to one footer read — results identical."""
    t = str(tmp_path / "bc")
    init_table(spark, t, _seed(spark, 50).coalesce(1))
    # surgically age the manifest: strip the rows key
    p = tx._manifest_path(t, 0)
    with open(p) as f:
        m = json.load(f)
    for e in m["files"]:
        e.pop("rows", None)
    os.chmod(p, 0o644)
    with open(p, "w") as f:
        json.dump(m, f)
    assert all("rows" not in e for e in resolve_files(t))
    v = delete_rows_dv(spark, t, "doc_id", list(range(10)))
    assert v == 1
    assert snapshot(spark, t).count() == 40
    # a fully-matched old-entry file still turns into a pure remove
    delete_rows_dv(spark, t, "doc_id", list(range(10, 50)))
    assert resolve_files(t) == []


def _spy_read_entries(monkeypatch):
    """Record the entry-list size of every _read_entries call — the
    job-count proxy: the old COW delete called it once per live file."""
    calls = []
    orig = tx._read_entries

    def spy(spark, table_dir, entries, version, **kw):
        calls.append(len(entries))
        return orig(spark, table_dir, entries, version, **kw)

    monkeypatch.setattr(tx, "_read_entries", spy)
    return calls


def test_cow_delete_is_one_probe_plus_one_rewrite_per_leaf(
    spark, tmp_path, monkeypatch
):
    """Round-5 verdict #3: copy-on-write delete_rows must not run one
    read→filter→count job per live file (1M sequential jobs at 1M
    files). Shape now: ONE distributed probe over the candidate set +
    ONE rewrite job per touched partition leaf."""
    t = str(tmp_path / "cow")
    init_table(spark, t, _seed(spark, 640).repartition(64))
    assert len(resolve_files(t)) == 64
    calls = _spy_read_entries(monkeypatch)
    v = tx.delete_rows(spark, t, "doc_id", [3, 77, 500])
    monkeypatch.undo()
    # 1 probe (all 64 entries: no stats/Bloom on this table) + 1 leaf
    # rewrite covering every partially-matched file together
    assert len(calls) == 2, f"per-file probe loop is back: {calls}"
    assert calls[0] == 64
    assert snapshot(spark, t, v).count() == 637
    assert (
        snapshot(spark, t).where(
            F.col("doc_id").isin([3, 77, 500])
        ).count()
        == 0
    )
    # no-match deletes commit nothing (parity with the DV sibling)
    assert tx.delete_rows(spark, t, "doc_id", [99999]) == v


def test_cow_delete_full_match_files_drop_without_rewrite(
    spark, tmp_path, monkeypatch
):
    """A file whose every live row matches is a pure remove decided
    from MANIFEST row totals — no rewrite job touches it."""
    t = str(tmp_path / "cowf")
    init_table(spark, t, _seed(spark, 10).coalesce(1))
    append(spark, t, _seed(spark, 10, offset=500).coalesce(1))
    calls = _spy_read_entries(monkeypatch)
    tx.delete_rows(spark, t, "doc_id", list(range(10)))
    monkeypatch.undo()
    assert calls == [2], f"full-match file must skip the rewrite: {calls}"
    assert len(resolve_files(t)) == 1
    assert snapshot(spark, t).count() == 10


def test_cow_delete_partitioned_rewrites_group_by_leaf(
    spark, tmp_path, monkeypatch
):
    """Hive-partitioned deletes rewrite per LEAF, not per file, and
    rewritten rows stay in their partition."""
    t = str(tmp_path / "cowp")
    df = _seed(spark, 200).repartition(8)
    tx.init_table(spark, t, df, partition_cols=["grp"])
    n_files = len(resolve_files(t))
    assert n_files > 7  # at least one file per grp leaf
    calls = _spy_read_entries(monkeypatch)
    # doc_ids 3 and 10 live in grp=3 (3%7) and grp=3 (10%7)... use two
    # keys in DIFFERENT groups: 3 -> grp 3, 4 -> grp 4
    tx.delete_rows(spark, t, "doc_id", [3, 4])
    monkeypatch.undo()
    # 1 probe + exactly one rewrite per touched leaf (2 leaves)
    assert len(calls) == 3, calls
    snap = snapshot(spark, t)
    assert snap.count() == 198
    assert snap.where(F.col("doc_id").isin([3, 4])).count() == 0
    # partition column still derives from paths for rewritten rows
    assert snap.where(F.col("grp") == 3).count() == _seed(
        spark, 200
    ).where((F.col("grp") == 3) & (F.col("doc_id") != 3)).count()


def test_dv_delete_accepts_dataframe_keys(spark, tmp_path, monkeypatch):
    """delete_rows_dv with a DataFrame key set equals the list form
    row-for-row, and nothing row-sized is collected to the driver."""
    t1, t2 = str(tmp_path / "dfk1"), str(tmp_path / "dfk2")
    for t in (t1, t2):
        init_table(spark, t, _seed(spark, 300).repartition(6))
    kill = [7, 13, 140, 299]
    delete_rows_dv(spark, t1, "doc_id", kill)
    keys = spark.createDataFrame(
        [(k, "extra") for k in kill], ["doc_id", "junk"]
    )
    cls = type(spark.range(1))
    collected = []
    orig = cls.collect

    def spy(self):
        collected.append([f.name for f in self.schema.fields])
        return orig(self)

    monkeypatch.setattr(cls, "collect", spy)
    delete_rows_dv(spark, t2, "doc_id", keys)
    monkeypatch.undo()
    for cols in collected:
        assert cols in (["lo", "hi"], ["file_name", "n"]), (
            f"row-sized driver materialization: {cols}"
        )
    a = sorted(map(tuple, snapshot(spark, t1).collect()))
    b = sorted(map(tuple, snapshot(spark, t2).collect()))
    assert a == b and len(a) == 296


def test_merge_bloom_prunes_probe_on_statless_table(
    spark, tmp_path, monkeypatch
):
    """Round-5 verdict #2: merge_upsert on a NON-stats key composes
    the per-file Bloom sidecar — the match probe shrinks to the files
    that can hold source keys, with identical results."""
    from etl_sentinel_imagery_spark.operators.skipping import (
        build_file_bloom_index,
    )

    t_idx, t_ref = str(tmp_path / "mb1"), str(tmp_path / "mb2")
    for t in (t_idx, t_ref):
        # 8 files of 50 ids each, disjoint ranges, NO stat_cols
        for i in range(8):
            df = _seed(spark, 50, offset=i * 50).coalesce(1)
            if i == 0:
                init_table(spark, t, df)
            else:
                append(spark, t, df)
        assert len(resolve_files(t)) == 8
    build_file_bloom_index(spark, t_idx, "doc_id")
    src = (
        _seed(spark, 5, offset=100)  # keys 100..104: ONE file holds them
        .withColumn("body", F.concat(F.lit("new-"), F.col("doc_id")))
    )
    calls = _spy_read_entries(monkeypatch)
    merge_upsert(spark, t_idx, src, "doc_id")
    monkeypatch.undo()
    probe_sizes = [c for c in calls]
    assert probe_sizes and probe_sizes[0] < 8, (
        f"Bloom did not prune the merge probe: {probe_sizes}"
    )
    merge_upsert(spark, t_ref, src, "doc_id")  # unindexed twin
    a = sorted(map(tuple, snapshot(spark, t_idx).collect()))
    b = sorted(map(tuple, snapshot(spark, t_ref).collect()))
    assert a == b and len(a) == 400
    assert sum(1 for r in a if str(r[2]).startswith("new-")) == 5


def test_dv_delete_df_keys_bloom_pruned(spark, tmp_path, monkeypatch):
    """The DataFrame-keyed delete composes the Bloom sidecar too: the
    probe set shrinks on a stat-less indexed table, results exact."""
    from etl_sentinel_imagery_spark.operators.skipping import (
        build_file_bloom_index,
    )

    t = str(tmp_path / "dvb")
    for i in range(6):
        df = _seed(spark, 40, offset=i * 40).coalesce(1)
        if i == 0:
            init_table(spark, t, df)
        else:
            append(spark, t, df)
    build_file_bloom_index(spark, t, "doc_id")
    keys = spark.range(45, 50).select(F.col("id").alias("doc_id"))
    calls = _spy_read_entries(monkeypatch)
    delete_rows_dv(spark, t, "doc_id", keys)
    monkeypatch.undo()
    assert calls and calls[0] < 6, (
        f"Bloom did not prune the DV probe: {calls}"
    )
    snap = snapshot(spark, t)
    assert snap.count() == 235
    assert snap.where(F.col("doc_id").between(45, 49)).count() == 0


def test_optimize_small_files_bin_packs_only_what_needs_it(
    spark, tmp_path
):
    """Delta's real OPTIMIZE shape: only files under the size
    threshold rewrite (bin-packed per leaf from MANIFEST bytes — no
    stat storm); big files are untouched; the commit is one atomic
    swap, content-neutral to the change feed; a second pass no-ops."""
    from etl_sentinel_imagery_spark.operators.txlog import (
        optimize_small_files,
    )

    t = str(tmp_path / "osf")
    init_table(
        spark, t, _seed(spark, 50_000).coalesce(1), stat_cols=["doc_id"]
    )
    for i in range(5):
        append(spark, t, _seed(spark, 10, offset=10**6 + i * 10).coalesce(1))
    entries = resolve_files(t)
    assert len(entries) == 6
    big = max(entries, key=lambda e: e["bytes"])
    assert big["bytes"] > 20_000
    assert sum(1 for e in entries if e["bytes"] < 20_000) == 5
    want = sorted(map(tuple, snapshot(spark, t).collect()))
    v0 = current_version(t)

    v, stats = optimize_small_files(spark, t, small_bytes=20_000)
    assert v == v0 + 1
    assert stats == {
        "files_considered": 6,
        "files_rewritten": 5,
        "files_written": 1,
    }
    after = resolve_files(t)
    assert len(after) == 2  # the big file + one packed file
    assert big["name"] in {tx._entry_name(e) for e in after}
    assert all("stats" in e for e in after)  # stats tracking preserved
    assert sorted(map(tuple, snapshot(spark, t).collect())) == want
    assert sorted(map(tuple, snapshot(spark, t, v0).collect())) == want
    # content-neutral: the feed skips it like compact/optimize, and
    # the verification mode proves the rewrite clean (empty diff)
    assert table_changes(spark, t, v0).count() == 0
    assert (
        table_changes(spark, t, v0, include_rewrites=True).count() == 0
    )
    # idempotent: one lone (possibly still-small) packed file + one
    # big file → nothing to gain, version unchanged
    v2, stats2 = optimize_small_files(spark, t, small_bytes=20_000)
    assert v2 == v and stats2["files_rewritten"] == 0


def test_optimize_small_files_materializes_dvs(spark, tmp_path):
    """A DV-carrying file qualifies regardless of size: the rewrite
    materializes the vectors away (entry loses its dv chain), rows
    unchanged."""
    from etl_sentinel_imagery_spark.operators.txlog import (
        optimize_small_files,
        table_details,
    )

    t = str(tmp_path / "osfdv")
    init_table(spark, t, _seed(spark, 50_000).coalesce(1))
    delete_rows_dv(spark, t, "doc_id", [5, 6, 7])
    assert table_details(t)["dv_dead_rows"] == 3
    want = sorted(map(tuple, snapshot(spark, t).collect()))
    v, stats = optimize_small_files(spark, t, small_bytes=1)
    assert stats["files_rewritten"] == 1
    assert table_details(t)["dv_dead_rows"] == 0
    assert all(tx._entry_dvs(e) == [] for e in resolve_files(t))
    assert sorted(map(tuple, snapshot(spark, t).collect())) == want


def test_optimize_small_files_partition_scoped(spark, tmp_path):
    """OPTIMIZE WHERE: the pass scopes to one hive leaf; other leaves
    keep their file lists byte-for-byte; rewritten rows keep their
    partition values (derived from the leaf path)."""
    from etl_sentinel_imagery_spark.operators.txlog import (
        optimize_small_files,
    )

    t = str(tmp_path / "osfp")
    tx.init_table(
        spark,
        t,
        _seed(spark, 70).repartition(4),
        partition_cols=["grp"],
    )
    for i in range(3):
        tx.append(
            spark, t, _seed(spark, 7, offset=700 + i * 7).coalesce(1)
        )
    before = {
        tx._entry_name(e)
        for e in resolve_files(t)
        if not tx._entry_name(e).startswith("grp=3")
    }
    want = sorted(map(tuple, snapshot(spark, t).collect()))
    n_g3 = sum(
        1 for e in resolve_files(t) if tx._entry_name(e).startswith("grp=3")
    )
    assert n_g3 >= 2
    v, stats = optimize_small_files(
        spark, t, small_bytes=10**9, partition={"grp": 3}
    )
    assert stats["files_considered"] == n_g3
    assert stats["files_rewritten"] == n_g3
    after_other = {
        tx._entry_name(e)
        for e in resolve_files(t)
        if not tx._entry_name(e).startswith("grp=3")
    }
    assert after_other == before  # out-of-scope leaves untouched
    assert sorted(map(tuple, snapshot(spark, t).collect())) == want
    with pytest.raises(ValueError, match="not a partition column"):
        optimize_small_files(spark, t, partition={"doc_id": 1})


def test_validate_table_recheck_after_restore(spark, tmp_path):
    """restore does not re-validate resurrected rows against
    constraints added after the target version (Delta-compatible);
    validate_table is the on-demand proof — it names the violation
    after the restore and passes clean once repaired."""
    from etl_sentinel_imagery_spark.operators.txlog import (
        delete_rows,
        restore,
        validate_table,
    )

    t = str(tmp_path / "vt")
    bad = spark.createDataFrame(
        [(1, 2, "ok"), (2, 99, "oob")], ["doc_id", "grp", "body"]
    )
    init_table(spark, t, bad)  # v0 holds a future violation
    delete_rows(spark, t, "doc_id", [2])  # v1: clean
    add_constraint(spark, t, "grp_bounded", "grp BETWEEN 0 AND 6")  # v2
    assert validate_table(spark, t) == {
        "version": 2,
        "n_constraints": 1,
        "rows_checked": 1,
    }
    restore(spark, t, 0)  # v3: the oob row is back, unvalidated
    with pytest.raises(ConstraintViolation, match="grp_bounded"):
        validate_table(spark, t)
    delete_rows(spark, t, "doc_id", [2])
    out = validate_table(spark, t)
    assert out["n_constraints"] == 1 and out["rows_checked"] == 1


def test_delete_where_predicate_targeted(spark, tmp_path):
    """DELETE WHERE: predicate-targeted merge-on-read delete — no key
    column, no key list; equals the snapshot-filter ground truth, DV
    entries (no rewrite), CDF shows exactly the dropped rows, NULL
    predicate results don't match, no-match commits nothing."""
    from etl_sentinel_imagery_spark.operators.txlog import delete_where

    t = str(tmp_path / "dw")
    df = spark.range(100).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 7).cast("int").alias("grp"),
        F.when(F.col("id") % 10 == 0, None)
        .otherwise((F.col("id") % 100) / 100.0)
        .alias("quality"),
    )
    init_table(spark, t, df.repartition(4))
    want = sorted(
        map(
            tuple,
            df.filter(
                ~F.coalesce(F.col("quality") < 0.3, F.lit(False))
            ).collect(),
        )
    )
    v = delete_where(spark, t, "quality < 0.3")
    assert v == 1
    assert sorted(map(tuple, snapshot(spark, t).collect())) == want
    # merge-on-read: data files unchanged, entries carry DVs
    assert any(tx._entry_dvs(e) for e in resolve_files(t))
    # the feed shows exactly the dropped rows as deletes
    feed = table_changes(spark, t, 0, 1)
    assert feed.where("_change_type = 'insert'").count() == 0
    assert (
        feed.where("_change_type = 'delete'").count()
        == 100 - len(want)
    )
    # NULL quality survived (WHERE semantics)
    assert snapshot(spark, t).where("quality IS NULL").count() == 10
    # no-match predicate: no commit
    assert delete_where(spark, t, "quality > 2.0") == v
    # Column form works too
    v2 = delete_where(spark, t, F.col("grp") == 6)
    assert snapshot(spark, t, v2).where("grp = 6").count() == 0


def test_update_rows_one_commit(spark, tmp_path):
    """UPDATE ... SET ... WHERE: matched rows DV-delete and re-insert
    updated in ONE commit; constraints enforce on the images;
    unknown SET columns refuse; time travel sees the pre-update rows;
    the feed shows the delete+insert pair under one version."""
    from etl_sentinel_imagery_spark.operators.txlog import (
        ConstraintViolation,
        add_constraint,
        update_rows,
    )

    t = str(tmp_path / "up")
    init_table(spark, t, _seed(spark, 100).repartition(3))
    add_constraint(spark, t, "grp_bounded", "grp BETWEEN 0 AND 20")
    v0 = current_version(t)
    v = update_rows(
        spark,
        t,
        "doc_id BETWEEN 10 AND 19",
        {"grp": "grp + 10", "body": F.concat(F.lit("upd-"), F.col("doc_id"))},
    )
    assert v == v0 + 1  # ONE commit
    snap = snapshot(spark, t)
    assert snap.count() == 100
    hit = snap.where("doc_id BETWEEN 10 AND 19")
    assert hit.where("body LIKE 'upd-%'").count() == 10
    assert hit.agg(F.min("grp")).collect()[0][0] >= 10
    # untouched rows identical; pre-update time travel exact
    assert snap.where("body LIKE 'r6-%'").count() == 90
    assert (
        snapshot(spark, t, v0).where("body LIKE 'upd-%'").count() == 0
    )
    # feed: 10 deletes + 10 inserts in one version
    feed = table_changes(spark, t, v0, v)
    assert feed.groupBy("_change_type").count().count() == 2
    assert feed.count() == 20
    assert feed.select("_commit_version").distinct().count() == 1
    # constraint enforcement on the images
    with pytest.raises(ConstraintViolation, match="grp_bounded"):
        update_rows(spark, t, "doc_id = 5", {"grp": "999"})
    # UPDATE cannot add columns
    with pytest.raises(ValueError, match="cannot add columns"):
        update_rows(spark, t, "doc_id = 5", {"nope": "1"})
    # no-match: no commit
    assert update_rows(spark, t, "doc_id < 0", {"grp": "0"}) == v


def test_update_rows_moves_partitions(spark, tmp_path):
    """Updating a partition column lands the new images in their new
    hive leaves (and the old positions DV-delete in place)."""
    from etl_sentinel_imagery_spark.operators.txlog import update_rows

    t = str(tmp_path / "upp")
    tx.init_table(
        spark, t, _seed(spark, 70).repartition(2), partition_cols=["grp"]
    )
    update_rows(spark, t, "grp = 3", {"grp": "6"})
    snap = snapshot(spark, t)
    assert snap.where("grp = 3").count() == 0
    assert snap.count() == 70
    want_moved = _seed(spark, 70).where("grp = 3").count()
    assert (
        snap.where("grp = 6").count()
        == want_moved + _seed(spark, 70).where("grp = 6").count()
    )
    # the new files live under grp=6/
    moved = [
        tx._entry_name(e)
        for e in resolve_files(t)
        if tx._entry_name(e).startswith("grp=6")
    ]
    assert len(moved) >= 2


def test_timestamp_as_of(spark, tmp_path):
    """TIMESTAMP AS OF: commits record wall-clock ts; resolution picks
    the latest version at-or-before the asked time with Delta's
    monotonicity adjustment; snapshot(timestamp=...) time-travels."""
    import time as _time

    from etl_sentinel_imagery_spark.operators.txlog import (
        version_at_timestamp,
    )

    t = str(tmp_path / "ts")
    init_table(spark, t, _seed(spark, 10))
    t_after_init = _time.time()
    _time.sleep(0.05)
    append(spark, t, _seed(spark, 5, offset=100))
    t_after_append = _time.time()
    assert version_at_timestamp(t, t_after_init) == 0
    assert version_at_timestamp(t, t_after_append) == 1
    assert version_at_timestamp(t, _time.time() + 100) == 1
    assert snapshot(spark, t, timestamp=t_after_init).count() == 10
    assert snapshot(spark, t, timestamp=t_after_append).count() == 15
    with pytest.raises(ValueError, match="no committed version"):
        version_at_timestamp(t, t_after_init - 10_000)
    with pytest.raises(ValueError, match="not both"):
        snapshot(spark, t, version=0, timestamp=t_after_init)
    # history surfaces commit times, monotone after adjustment
    hs = tx.history(t)
    assert all("ts" in h for h in hs)


def test_new_verbs_conflict_losers_leave_no_partial_state(
    spark, tmp_path
):
    """update_rows / delete_where / optimize_small_files absorb a lost
    claim race LOCK-FREE (the rebase loop retries transparently —
    exactly append's contract). Losers' orphaned sidecars/data files
    are vacuumable garbage."""
    from etl_sentinel_imagery_spark.operators.txlog import (
        delete_where,
        optimize_small_files,
        update_rows,
    )

    t = str(tmp_path / "race6")
    init_table(spark, t, _seed(spark, 60).repartition(3))

    class LoseOnce(tx.PosixLogStore):
        def __init__(self):
            self.lose = 1

        def claim(self, tmp_path, final_path):
            if self.lose > 0:
                self.lose -= 1
                return False
            return super().claim(tmp_path, final_path)

    # every rewrite/DV verb rides the rebase loop: one spurious loss
    # is retried inside the call, the table ends one version ahead
    for attempt in (
        lambda: update_rows(
            spark, t, "doc_id < 5", {"body": F.lit("race-upd")}
        ),
        lambda: delete_where(spark, t, "doc_id = 58"),
        lambda: optimize_small_files(spark, t, small_bytes=10**9),
    ):
        before_rows = snapshot(spark, t).count()
        v_before = current_version(t)
        tx.set_log_store(LoseOnce())
        try:
            attempt()
            assert current_version(t) == v_before + 1
        finally:
            tx.set_log_store(tx.PosixLogStore())
        # rewrites are content-neutral; the DV verbs' row deltas are
        # asserted below
        assert snapshot(spark, t).count() <= before_rows

    snap = snapshot(spark, t)
    assert snap.where("body = 'race-upd'").count() == 5
    assert snap.where("doc_id = 58").count() == 0
    assert snap.count() == 59
    # the rebases reused their staged files/sidecars — nothing
    # orphaned; vacuum has nothing to reclaim and live data is intact
    vacuum(t, min_age_seconds=0)
    assert sorted(map(tuple, snapshot(spark, t).collect())) == sorted(
        map(tuple, snap.collect())
    )


def test_optimize_partition_scoped_zorder(spark, tmp_path):
    """OPTIMIZE ... WHERE: the ZORDER relayout scopes to one hive leaf
    — out-of-scope leaves keep their exact file lists (unnamed in the
    delta), rows identical, and the rewritten leaf's files carry fresh
    manifest stats for pruning."""
    from etl_sentinel_imagery_spark.operators.txlog import optimize

    t = str(tmp_path / "ozp")
    tx.init_table(
        spark,
        t,
        _seed(spark, 210).repartition(6),
        stat_cols=["doc_id"],
        partition_cols=["grp"],
    )
    before_other = {
        tx._entry_name(e)
        for e in resolve_files(t)
        if not tx._entry_name(e).startswith("grp=2")
    }
    want = sorted(map(tuple, snapshot(spark, t).collect()))
    v = optimize(
        spark, t, zorder_by=["doc_id"], target_files=2,
        partition={"grp": 2},
    )
    delta = read_manifest(t, v)
    assert all(n.startswith("grp=2") for n in delta["removes"])
    after_other = {
        tx._entry_name(e)
        for e in resolve_files(t)
        if not tx._entry_name(e).startswith("grp=2")
    }
    assert after_other == before_other
    assert sorted(map(tuple, snapshot(spark, t).collect())) == want
    # rewritten leaf entries carry stats (pruning keeps working)
    g2 = [
        e
        for e in resolve_files(t)
        if tx._entry_name(e).startswith("grp=2")
    ]
    assert g2 and all("stats" in e for e in g2)
    # scoping to a missing leaf value is a no-op
    assert optimize(spark, t, partition={"grp": 99}) == v
    with pytest.raises(ValueError, match="not a partition column"):
        optimize(spark, t, partition={"doc_id": 0})


def test_cow_delete_accepts_dataframe_keys(spark, tmp_path):
    """The copy-on-write delete takes a DataFrame key set too — same
    contract as the DV sibling; equals the list form row-for-row."""
    from etl_sentinel_imagery_spark.operators.txlog import delete_rows

    t1, t2 = str(tmp_path / "cdf1"), str(tmp_path / "cdf2")
    for t in (t1, t2):
        init_table(spark, t, _seed(spark, 200).repartition(4))
    kill = [3, 77, 150]
    delete_rows(spark, t1, "doc_id", kill)
    delete_rows(
        spark,
        t2,
        "doc_id",
        spark.createDataFrame([(k,) for k in kill], ["doc_id"]),
    )
    a = sorted(map(tuple, snapshot(spark, t1).collect()))
    b = sorted(map(tuple, snapshot(spark, t2).collect()))
    assert a == b and len(a) == 197


def test_mv_delta_tracks_update_and_delete_where_commits(
    spark, tmp_path
):
    """The incremental MV refresh (incremental_agg_delta, keyed on
    (name, dv) entry state) stays exact across the NEW verbs: an
    UPDATE commit nets to (new images − pre-images) and a predicate
    delete nets to −(dropped rows) — old_mv ⊎ delta == full recompute
    without reading untouched files."""
    from etl_sentinel_imagery_spark.operators.txlog import (
        delete_where,
        incremental_agg_delta,
        update_rows,
    )

    t = str(tmp_path / "mvd")
    df = spark.range(120).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 5).cast("int").alias("grp"),
        (F.col("id") * 2).alias("qty"),
    )
    init_table(spark, t, df.repartition(3))
    v0 = current_version(t)

    def mv_of(version):
        return {
            r["grp"]: (r["n"], r["sum_qty"])
            for r in snapshot(spark, t, version)
            .groupBy("grp")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("qty").alias("sum_qty"),
            )
            .collect()
        }

    update_rows(spark, t, "doc_id < 10", {"qty": "qty + 1000"})
    v1 = delete_where(spark, t, "grp = 4")
    delta = {
        r["grp"]: (r["n"], r["sum_qty"])
        for r in incremental_agg_delta(
            spark, t, v0, v1, ["grp"], sum_cols=["qty"]
        ).collect()
    }
    base, final = mv_of(v0), mv_of(v1)
    applied = {}
    for g in set(base) | set(delta):
        n = base.get(g, (0, 0))[0] + delta.get(g, (0, 0))[0]
        s = (base.get(g, (0, 0))[1] or 0) + (delta.get(g, (0, 0))[1] or 0)
        if n:
            applied[g] = (n, s)
    assert applied == final


def test_live_stream_drives_upsert_sink(spark, tmp_path):
    """The rate-tick streaming wrapper composes with the round-6
    upsert sink: a real Structured Streaming query keeps a
    latest-state silver current through upstream merges and deletes."""
    import shutil as _shutil

    from etl_sentinel_imagery_spark.streaming.cdf_source import (
        cdf_upsert_sink,
        start_cdf_stream,
    )

    src = str(tmp_path / "lsrc")
    dst = str(tmp_path / "ldst")
    ckpt = str(tmp_path / "lck")
    init_table(spark, src, _seed(spark, 30))
    sink = cdf_upsert_sink(dst, "doc_id", app_id="live-up")
    q = start_cdf_stream(spark, src, ckpt, sink, rows_per_second=50)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert snapshot(spark, dst).count() == 30

    merge_upsert(
        spark,
        src,
        _seed(spark, 5).withColumn("body", F.lit("live-upd")),
        "doc_id",
    )
    delete_rows_dv(spark, src, "doc_id", [9])
    _shutil.rmtree(os.path.join(ckpt, "_ticks"))
    q2 = start_cdf_stream(spark, src, ckpt, sink, rows_per_second=50)
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    snap = snapshot(spark, dst)
    assert snap.count() == 30  # deletes keep the key's last state
    assert snap.where("body = 'live-upd'").count() == 5
    assert snap.where("doc_id = 9").count() == 1


def test_mmh3_parity_with_spark_hash(spark):
    """The driver-side Murmur3 twin (`_mmh3_int`) must agree with the
    JVM's `F.hash` on IntegerType for every salt the exact-bin router
    could emit — one disagreement and a bin lands in the wrong
    repartition slot (merged files, never wrong rows; still pinned)."""
    vals = list(range(-1000, 1001)) + [2**31 - 1, -(2**31), 123456789]
    df = spark.createDataFrame(
        [(v,) for v in vals], "v int"
    ).select("v", F.hash("v").alias("h"))
    got = {r["v"]: r["h"] for r in df.collect()}
    for v in vals:
        assert tx._mmh3_int(v) == got[v], v


def test_multi_leaf_optimize_exact_bin_counts(spark, tmp_path):
    """Round-10 ROADMAP #5: the batched multi-leaf rewrite's per-leaf
    output counts are EXACT — each (leaf, bin) is routed by a
    pre-searched salt into its own shuffle slot, so no two bins merge
    into one task. ceil(candidate_bytes/target) IS the committed file
    count per leaf (under the old pmod(hash) routing, ~20 bins into
    ~20 slots collided with near-certainty and merged)."""
    import math

    from etl_sentinel_imagery_spark.operators.txlog import (
        optimize_small_files,
    )

    t = str(tmp_path / "exact_bins")
    tx.init_table(
        spark,
        t,
        _seed(spark, 140).repartition(4),
        partition_cols=["grp"],
        stat_cols=["doc_id"],
    )
    for i in range(4):
        tx.append(
            spark, t, _seed(spark, 140, offset=1000 + 140 * i).repartition(3)
        )
    entries = resolve_files(t)
    by_leaf: dict[str, list] = {}
    for e in entries:
        by_leaf.setdefault(
            os.path.dirname(tx._entry_name(e)), []
        ).append(e)
    target = 4000
    expected = {}
    for leaf, es in by_leaf.items():
        if len(es) < 2:
            continue  # lone DV-free small file: skipped by design
        expected[leaf] = max(
            1, math.ceil(sum(e["bytes"] for e in es) / target)
        )
    assert len(expected) >= 5  # a genuinely multi-leaf rewrite
    assert sum(expected.values()) >= 10
    want = sorted(map(tuple, snapshot(spark, t).collect()))

    v, stats = optimize_small_files(
        spark, t, small_bytes=10**9, target_bytes=target
    )
    after: dict[str, int] = {}
    for e in resolve_files(t):
        leaf = os.path.dirname(tx._entry_name(e))
        after[leaf] = after.get(leaf, 0) + 1
    for leaf, n in expected.items():
        assert after[leaf] == n, (leaf, n, after)
    assert stats["files_written"] == sum(expected.values())
    assert sorted(map(tuple, snapshot(spark, t).collect())) == want
    assert table_changes(spark, t, v - 1).count() == 0
