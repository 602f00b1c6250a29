"""ROW TRACKING: stable row ids that survive rewrites.

Enablement is metadata-only (base_rid per entry, ids derived from
parquet row position); appends stay zero-cost (base_rid stamped inside
the manifest claim); rewrites materialize `_row_id` physically; DV
deletes need nothing. `snapshot_rowids` reads ids back in one scan;
`row_changes` classifies net history as insert / delete /
update_preimage / update_postimage keyed by id.

Reference intent: the reference engine (570-line single-node script)
has no transactional storage at all; this mirrors Delta Lake's row
tracking (base row IDs + materialized row IDs) re-expressed on the
repo's manifest txlog.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_sentinel_imagery_spark.operators.txlog import (
    append,
    clone_table,
    compact,
    current_version,
    delete_rows,
    delete_rows_dv,
    enable_row_tracking,
    init_table,
    merge,
    optimize,
    optimize_small_files,
    resolve_row_tracking,
    restore,
    row_changes,
    snapshot,
    snapshot_rowids,
    table_changes,
    truncate_history,
    update_rows,
)


def _df(spark, lo, hi, status="a"):
    return spark.createDataFrame(
        [(i, i * 10, status) for i in range(lo, hi)],
        ["doc_id", "qty", "status"],
    )


def _ids(spark, t):
    return {
        r["doc_id"]: r["_row_id"]
        for r in snapshot_rowids(spark, t).collect()
    }


def test_enable_assigns_dense_unique_ids_and_appends_extend(
    spark, tmp_path
):
    t = str(tmp_path / "t")
    init_table(spark, t, _df(spark, 0, 6).repartition(2))
    enable_row_tracking(t)
    ids = _ids(spark, t)
    assert sorted(ids.values()) == list(range(6))  # dense, unique
    append(spark, t, _df(spark, 6, 10))
    ids2 = _ids(spark, t)
    assert sorted(ids2.values()) == list(range(10))
    # pre-existing rows kept their ids
    assert all(ids2[k] == v for k, v in ids.items())
    assert resolve_row_tracking(t)["watermark"] == 10
    # the enabling commit is content-neutral for the feed
    assert table_changes(spark, t, 0, 1).count() == 0
    assert (
        table_changes(spark, t, 0, 1, include_rewrites=True).count() == 0
    )


def test_ids_stable_across_rewrites(spark, tmp_path):
    t = str(tmp_path / "t")
    init_table(spark, t, _df(spark, 0, 8).repartition(3))
    enable_row_tracking(t)
    before = _ids(spark, t)
    compact(spark, t, target_files=1)
    assert _ids(spark, t) == before
    optimize(spark, t, zorder_by=["qty", "doc_id"], target_files=2)
    assert _ids(spark, t) == before
    optimize_small_files(spark, t)  # everything is tiny: bin-packs
    assert _ids(spark, t) == before
    # snapshot stays id-free — _row_id is not part of the table schema
    assert "_row_id" not in snapshot(spark, t).columns


def test_dv_and_cow_deletes_keep_survivor_ids(spark, tmp_path):
    t = str(tmp_path / "t")
    init_table(spark, t, _df(spark, 0, 8).repartition(2))
    enable_row_tracking(t)
    before = _ids(spark, t)
    delete_rows_dv(spark, t, "doc_id", [2, 5])
    mid = _ids(spark, t)
    assert set(mid) == set(range(8)) - {2, 5}
    assert all(mid[k] == before[k] for k in mid)
    delete_rows(spark, t, "doc_id", [7])  # COW rewrite of its file
    after = _ids(spark, t)
    assert set(after) == set(range(8)) - {2, 5, 7}
    assert all(after[k] == before[k] for k in after)


def test_update_preserves_ids(spark, tmp_path):
    t = str(tmp_path / "t")
    init_table(spark, t, _df(spark, 0, 6).coalesce(1))
    enable_row_tracking(t)
    before = _ids(spark, t)
    update_rows(spark, t, "doc_id >= 4", {"status": F.lit("upd")})
    rows = {
        r["doc_id"]: (r["_row_id"], r["status"])
        for r in snapshot_rowids(spark, t).collect()
    }
    for k in range(6):
        assert rows[k][0] == before[k]
        assert rows[k][1] == ("upd" if k >= 4 else "a")


def test_merge_preserves_update_ids_and_assigns_fresh_inserts(
    spark, tmp_path
):
    t = str(tmp_path / "t")
    init_table(spark, t, _df(spark, 0, 6).coalesce(1))
    enable_row_tracking(t)
    before = _ids(spark, t)
    wm0 = resolve_row_tracking(t)["watermark"]
    src = spark.createDataFrame(
        [(4, 400, "s"), (5, 500, "s"), (9, 900, "s"), (11, 1100, "s")],
        ["doc_id", "qty", "status"],
    )
    merge(spark, t, src, "doc_id")
    ids = _ids(spark, t)
    assert ids[4] == before[4] and ids[5] == before[5]  # updates keep
    fresh = {ids[9], ids[11]}
    assert fresh.isdisjoint(set(before.values()))
    assert min(fresh) >= wm0  # inserts draw past the watermark
    assert len(set(ids.values())) == len(ids)
    # engine owns the column
    with pytest.raises(ValueError, match="engine-owned"):
        merge(spark, t, src.withColumn("_row_id", F.lit(1)), "doc_id")
    with pytest.raises(ValueError, match="engine-owned"):
        append(spark, t, src.withColumn("_row_id", F.lit(1)))


def test_merge_delete_clause_drops_ids(spark, tmp_path):
    t = str(tmp_path / "t")
    init_table(spark, t, _df(spark, 0, 6).coalesce(1))
    enable_row_tracking(t)
    before = _ids(spark, t)
    src = spark.createDataFrame(
        [(1, 0, "x", True), (3, 333, "x", False)],
        ["doc_id", "qty", "status", "tomb"],
    )
    merge(
        spark,
        t,
        src,
        "doc_id",
        when_matched=[
            ("delete", "s.tomb"),
            ("update", None, {"qty": "s.qty"}),
        ],
        when_not_matched=[],
    )
    ids = _ids(spark, t)
    assert set(ids) == set(range(6)) - {1}
    assert all(ids[k] == before[k] for k in ids)


def test_restore_keeps_ids_and_watermark_never_rewinds(
    spark, tmp_path
):
    t = str(tmp_path / "t")
    init_table(spark, t, _df(spark, 0, 4).coalesce(1))
    enable_row_tracking(t)
    v1 = current_version(t)
    ids_v1 = _ids(spark, t)
    append(spark, t, _df(spark, 4, 8))
    wm = resolve_row_tracking(t)["watermark"]
    restore(spark, t, v1)
    assert _ids(spark, t) == ids_v1
    assert resolve_row_tracking(t)["watermark"] == wm  # no rewind
    append(spark, t, _df(spark, 20, 22))
    ids = _ids(spark, t)
    assert len(set(ids.values())) == len(ids)
    assert {ids[20], ids[21]} == {wm, wm + 1}  # never reused


def test_row_changes_classification(spark, tmp_path):
    t = str(tmp_path / "t")
    init_table(spark, t, _df(spark, 0, 6).repartition(2))
    enable_row_tracking(t)
    v0 = current_version(t)
    ids0 = _ids(spark, t)
    update_rows(spark, t, "doc_id = 2", {"qty": F.lit(999)})
    delete_rows_dv(spark, t, "doc_id", [0])
    append(spark, t, _df(spark, 10, 12, status="new"))
    compact(spark, t, target_files=1)  # rewrite inside the range
    ch = row_changes(spark, t, v0)
    by = {
        (r["_change_type"], r["doc_id"]): r
        for r in ch.collect()
    }
    kinds = sorted(k for k in by)
    assert kinds == [
        ("delete", 0),
        ("insert", 10),
        ("insert", 11),
        ("update_postimage", 2),
        ("update_preimage", 2),
    ]
    assert by[("update_preimage", 2)]["qty"] == 20
    assert by[("update_postimage", 2)]["qty"] == 999
    assert (
        by[("update_preimage", 2)]["_row_id"]
        == by[("update_postimage", 2)]["_row_id"]
        == ids0[2]
    )
    assert by[("delete", 0)]["_row_id"] == ids0[0]
    # untouched-and-rewritten rows (1,3,4,5) net away entirely
    assert len(by) == 5
    # no-change range is empty
    v = current_version(t)
    assert row_changes(spark, t, v, v).count() == 0


def test_watermark_survives_truncate_and_clone(spark, tmp_path):
    t = str(tmp_path / "t")
    init_table(spark, t, _df(spark, 0, 4).coalesce(1))
    enable_row_tracking(t)
    for lo in (4, 6, 8):
        append(spark, t, _df(spark, lo, lo + 2))
    ids = _ids(spark, t)
    truncate_history(t, keep_versions=1)
    assert resolve_row_tracking(t)["watermark"] == 10
    assert _ids(spark, t) == ids
    c = str(tmp_path / "c")
    clone_table(t, c)
    assert resolve_row_tracking(c)["watermark"] == 10
    assert _ids(spark, c) == ids
    append(spark, c, _df(spark, 30, 32))
    cids = _ids(spark, c)
    assert len(set(cids.values())) == len(cids)  # no reuse in clone


_OP = None


def _ops_strategy():
    global _OP
    if _OP is None:
        from hypothesis import strategies as st

        _OP = st.lists(
            st.one_of(
                st.tuples(st.just("append"), st.integers(0, 10**6)),
                st.tuples(st.just("delete"), st.integers(0, 10**6)),
                st.tuples(st.just("update"), st.integers(0, 10**6)),
                st.tuples(st.just("merge"), st.integers(0, 10**6)),
                st.tuples(st.just("compact"), st.just(0)),
                st.tuples(st.just("optimize_small"), st.just(0)),
                st.tuples(st.just("restore"), st.integers(0, 10**6)),
            ),
            min_size=1,
            max_size=6,
        )
    return _OP


def test_random_op_sequences_keep_ids_unique_and_rewrites_stable(
    spark, tmp_path_factory
):
    """Model invariants under random op interleavings: row ids stay
    UNIQUE at every version (the one guarantee everything else builds
    on), the watermark never decreases, every live id sits below it,
    and pure rewrites (compact / small-file optimize) preserve the
    complete id→row map bit-for-bit."""
    from hypothesis import given, settings

    @settings(max_examples=6, deadline=None)
    @given(_ops_strategy())
    def run(ops):
        t = str(tmp_path_factory.mktemp("ridmodel") / "t")
        init_table(
            spark,
            t,
            spark.createDataFrame(
                [(i, f"init-{i}") for i in range(8)],
                ["doc_id", "val"],
            ).repartition(2),
        )
        enable_row_tracking(t)
        versions = [current_version(t)]
        last_wm = resolve_row_tracking(t)["watermark"]
        for kind, seed in ops:
            id_map_before = {
                r["_row_id"]: (r["doc_id"], r["val"])
                for r in snapshot_rowids(spark, t).collect()
            }
            if kind == "append":
                append(
                    spark,
                    t,
                    spark.createDataFrame(
                        [
                            ((seed + i) % 37, f"a-{seed}-{i}")
                            for i in range(4)
                        ],
                        ["doc_id", "val"],
                    ),
                )
            elif kind == "delete":
                delete_rows_dv(
                    spark, t, "doc_id", [seed % 37, (seed // 7) % 37]
                )
            elif kind == "update":
                update_rows(
                    spark,
                    t,
                    f"doc_id % 5 = {seed % 5}",
                    {"val": F.lit(f"u-{seed}")},
                )
            elif kind == "merge":
                ks = sorted({seed % 37, (seed // 5) % 37})
                merge(
                    spark,
                    t,
                    spark.createDataFrame(
                        [(k, f"m-{seed}-{k}") for k in ks],
                        ["doc_id", "val"],
                    ),
                    "doc_id",
                    when_matched=[
                        ("delete", f"s.doc_id % 11 = {seed % 11}"),
                        ("update", None, {"val": "s.val"}),
                    ],
                    when_not_matched=[("insert", None)],
                )
            elif kind == "compact":
                compact(spark, t, target_files=2)
            elif kind == "optimize_small":
                optimize_small_files(spark, t, small_bytes=10**9)
            elif kind == "restore":
                restore(spark, t, versions[seed % len(versions)])
            versions.append(current_version(t))
            rows = snapshot_rowids(spark, t).collect()
            ids = [r["_row_id"] for r in rows]
            assert len(ids) == len(set(ids)), (
                f"id collision after {kind}({seed})"
            )
            wm = resolve_row_tracking(t)["watermark"]
            assert wm >= last_wm, f"watermark rewound after {kind}"
            assert all(i < wm for i in ids)
            last_wm = wm
            if kind in ("compact", "optimize_small"):
                id_map_after = {
                    r["_row_id"]: (r["doc_id"], r["val"]) for r in rows
                }
                assert id_map_after == id_map_before, (
                    f"rewrite moved ids ({kind})"
                )

    run()


def test_enable_twice_and_disabled_reads_raise(spark, tmp_path):
    t = str(tmp_path / "t")
    init_table(spark, t, _df(spark, 0, 3).coalesce(1))
    with pytest.raises(ValueError, match="not enabled"):
        snapshot_rowids(spark, t)
    with pytest.raises(ValueError, match="not enabled"):
        row_changes(spark, t, 0)
    enable_row_tracking(t)
    with pytest.raises(ValueError, match="already enabled"):
        enable_row_tracking(t)
