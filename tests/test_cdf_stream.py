"""Streaming CDF source: tail table_changes with a checkpointed
cursor; exactly-once end-to-end into a downstream txlog table.

Acceptance contract (round-4 verdict #2): a downstream aggregate fed
by the stream equals the batch CDF fold across restarts (the cursor
survives), and a delete-rewrite commit streams exactly its dropped
rows.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from etl_sentinel_imagery_spark.operators.txlog import (
    append,
    compact,
    current_version,
    delete_rows,
    delete_rows_dv,
    init_table,
    snapshot,
    table_changes,
)
from etl_sentinel_imagery_spark.streaming.cdf_source import (
    CdfCursor,
    cdf_append_sink,
    cdf_step,
    drain_table_changes,
    start_cdf_stream,
)


def _seed(spark, n=60, offset=0):
    return spark.range(offset, offset + n).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 5).cast("int").alias("grp"),
        (F.col("id") * 3).cast("long").alias("val"),
    )


def _signed_agg(spark, dst):
    """Fold the accumulated raw feed into a per-group aggregate:
    insert rows count +1, delete rows count -1."""
    sign = F.when(F.col("_change_type") == "insert", F.lit(1)).otherwise(
        F.lit(-1)
    )
    return {
        r["grp"]: (r["n"], r["s"])
        for r in snapshot(spark, dst)
        .groupBy("grp")
        .agg(
            F.sum(sign).alias("n"),
            F.sum(sign * F.col("val")).alias("s"),
        )
        .collect()
        if r["n"] != 0
    }


def test_stream_fold_equals_batch_cdf_across_restarts(spark, tmp_path):
    """Commits land between drains; the consumer 'restarts' each time
    (fresh function calls — cursor state lives only on disk). The
    downstream fold must equal BOTH the one-shot batch CDF fold and
    the live snapshot aggregate."""
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    ckpt = str(tmp_path / "ckpt")
    sink = cdf_append_sink(dst)

    init_table(spark, src, _seed(spark, 60).repartition(3))
    r1 = drain_table_changes(spark, src, ckpt, sink)
    assert r1 == [(-1, 0)]

    append(spark, src, _seed(spark, 20, offset=100))
    append(spark, src, _seed(spark, 10, offset=200))
    delete_rows_dv(spark, src, "doc_id", [3, 103, 203])
    # restart: nothing in memory carries over
    r2 = drain_table_changes(spark, src, str(tmp_path / "ckpt"), sink)
    assert r2 == [(0, 3)]

    delete_rows(spark, src, "doc_id", [7, 107])  # rewrite form
    compact(spark, src, target_files=2)  # content-neutral: skipped
    r3 = drain_table_changes(spark, src, str(tmp_path / "ckpt"), sink)
    assert r3 == [(3, 5)]

    # already caught up → no-op
    assert cdf_step(spark, src, ckpt, sink) is None

    got = _signed_agg(spark, dst)
    # one-shot batch CDF fold over the same range
    sign = F.when(F.col("_change_type") == "insert", F.lit(1)).otherwise(
        F.lit(-1)
    )
    want_batch = {
        r["grp"]: (r["n"], r["s"])
        for r in table_changes(spark, src, -1)
        .groupBy("grp")
        .agg(F.sum(sign).alias("n"), F.sum(sign * F.col("val")).alias("s"))
        .collect()
        if r["n"] != 0
    }
    # and the live table itself
    want_live = {
        r["grp"]: (r["n"], r["s"])
        for r in snapshot(spark, src)
        .groupBy("grp")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("val").alias("s"))
        .collect()
    }
    assert got == want_batch == want_live


def test_rewrite_delete_streams_exactly_its_dropped_rows(spark, tmp_path):
    src = str(tmp_path / "src2")
    ckpt = str(tmp_path / "ck2")
    init_table(spark, src, _seed(spark, 50).repartition(4))
    seen = []
    drain_table_changes(
        spark, src, ckpt, lambda df, rng: seen.append((rng, df.collect()))
    )
    seen.clear()
    delete_rows(spark, src, "doc_id", [11, 22, 33])
    drain_table_changes(
        spark, src, ckpt, lambda df, rng: seen.append((rng, df.collect()))
    )
    (rng, rows), = seen
    assert rng == (0, 1)
    got = sorted(
        (r["doc_id"], r["_change_type"], r["_commit_op"]) for r in rows
    )
    assert got == [
        (11, "delete", "delete"),
        (22, "delete", "delete"),
        (33, "delete", "delete"),
    ]


def test_crash_between_process_and_advance_is_exactly_once(
    spark, tmp_path
):
    """Process succeeds, crash before the cursor write: the restart
    replays the identical range and the range-tagged sink commits
    nothing twice."""
    src = str(tmp_path / "src3")
    dst = str(tmp_path / "dst3")
    ckpt = str(tmp_path / "ck3")
    init_table(spark, src, _seed(spark, 30))
    sink = cdf_append_sink(dst)
    drain_table_changes(spark, src, ckpt, sink)
    append(spark, src, _seed(spark, 10, offset=500))

    def crashy(df, rng):
        sink(df, rng)
        raise RuntimeError("crash after delivery, before cursor advance")

    with pytest.raises(RuntimeError, match="before cursor"):
        cdf_step(spark, src, ckpt, crashy)
    assert CdfCursor(ckpt).read() == 0  # cursor did NOT move
    # restart with the normal sink: same range replays, tag dedupes
    assert cdf_step(spark, src, ckpt, sink) == (0, 1)
    assert CdfCursor(ckpt).read() == 1
    assert snapshot(spark, dst).count() == 40  # 30 init + 10, ONCE
    got = _signed_agg(spark, dst)
    want = {
        r["grp"]: (r["n"], r["s"])
        for r in snapshot(spark, src)
        .groupBy("grp")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("val").alias("s"))
        .collect()
    }
    assert got == want


def test_max_versions_chunks_the_feed(spark, tmp_path):
    src = str(tmp_path / "src4")
    ckpt = str(tmp_path / "ck4")
    init_table(spark, src, _seed(spark, 10))
    for i in range(4):
        append(spark, src, _seed(spark, 5, offset=1000 + i * 10))
    ranges = drain_table_changes(
        spark, src, ckpt, lambda df, rng: None, max_versions=2
    )
    assert ranges == [(-1, 1), (1, 3), (3, 4)]


def test_live_streaming_query_tails_the_table(spark, tmp_path):
    """The rate-tick wrapper: a real Structured Streaming query
    drains pending commits; the cursor (not rate offsets) carries
    consumption, so a restart with a fresh tick checkpoint replays
    nothing."""
    src = str(tmp_path / "src5")
    dst = str(tmp_path / "dst5")
    ckpt = str(tmp_path / "ck5")
    init_table(spark, src, _seed(spark, 20))
    append(spark, src, _seed(spark, 5, offset=300))
    sink = cdf_append_sink(dst)

    q = start_cdf_stream(spark, src, ckpt, sink, rows_per_second=50)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert CdfCursor(ckpt).read() == 1
    assert snapshot(spark, dst).count() == 25

    # more commits; restart the stream with a FRESH tick checkpoint —
    # the cursor alone prevents replay
    delete_rows_dv(spark, src, "doc_id", [2])
    import shutil

    shutil.rmtree(os.path.join(ckpt, "_ticks"))
    q2 = start_cdf_stream(spark, src, ckpt, sink, rows_per_second=50)
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    assert CdfCursor(ckpt).read() == 2
    got = _signed_agg(spark, dst)
    want = {
        r["grp"]: (r["n"], r["s"])
        for r in snapshot(spark, src)
        .groupBy("grp")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("val").alias("s"))
        .collect()
    }
    assert got == want


def test_sinks_inherit_partitioned_layout(spark, tmp_path):
    """A stream/CDF delivery into a hive-partitioned txlog table must
    write col=val leaves like append() does — pre-fix, files landed
    unpartitioned in the root and basePath reads NULLed the partition
    columns."""
    from etl_sentinel_imagery_spark.operators.txlog import (
        _entry_name,
        resolve_files,
    )

    # cdf_append_sink into a PRE-CREATED partitioned destination
    src = str(tmp_path / "psrc")
    dst = str(tmp_path / "pdst")
    init_table(spark, src, _seed(spark, 40))
    # destination partitioned by grp and seeded with the feed's schema
    seed_feed = table_changes(spark, src, -1, 0).limit(0)
    init_table(spark, dst, seed_feed, partition_cols=["grp"])
    drain_table_changes(
        spark, src, str(tmp_path / "pck"), cdf_append_sink(dst)
    )
    snap = snapshot(spark, dst)
    assert snap.count() == 40
    assert snap.filter(F.col("grp").isNull()).count() == 0
    for e in resolve_files(dst):
        if _entry_name(e).startswith("part-") and "/" not in _entry_name(e):
            raise AssertionError(f"unpartitioned file: {_entry_name(e)}")
    # the epoch sink: same rule, via a bounded file-based stream
    from etl_sentinel_imagery_spark.streaming.events import (
        run_foreach_batch_to_txlog,
    )

    feed_dir = str(tmp_path / "feed")
    _seed(spark, 35).write.parquet(feed_dir)
    stream = spark.readStream.schema(
        "doc_id bigint, grp int, val bigint"
    ).parquet(feed_dir)
    t2 = str(tmp_path / "esink")
    init_table(
        spark, t2, _seed(spark, 1).limit(0), partition_cols=["grp"]
    )
    run_foreach_batch_to_txlog(stream, t2, str(tmp_path / "eck"))
    snap2 = snapshot(spark, t2)
    assert snap2.count() == 35
    assert snap2.filter(F.col("grp").isNull()).count() == 0
    for e in resolve_files(t2):
        assert "grp=" in _entry_name(e)


def test_replay_check_is_checkpoint_bounded(spark, tmp_path, monkeypatch):
    """The sinks' idempotence watermark must resolve through at most
    ~CHECKPOINT_EVERY manifests however long the history — the Delta
    SetTransaction design (pre-fix, every micro-batch scanned the
    ENTIRE history for its op tag: quadratic over a stream's life).
    Watermarks also survive retention."""
    from etl_sentinel_imagery_spark.operators import txlog as tx

    t = str(tmp_path / "wm")
    init_table(spark, t, _seed(spark, 5).coalesce(1))
    for i in range(50):
        tx._commit_delta(
            t,
            tx.current_version(t),
            [],
            [],
            f"stream_epoch_{i}",
            txn=("epoch-sink", i),
        )
    calls = {"n": 0}
    orig = tx.read_manifest

    def counting(table_dir, version=None):
        calls["n"] += 1
        return orig(table_dir, version)

    monkeypatch.setattr(tx, "read_manifest", counting)
    wm = tx.resolve_txns(t)
    assert wm == {"epoch-sink": 49}
    assert calls["n"] <= tx.CHECKPOINT_EVERY + 2, (
        f"watermark resolution read {calls['n']} manifests"
    )
    # watermarks survive truncate_history's self-contained horizon
    monkeypatch.setattr(tx, "read_manifest", orig)
    tx.truncate_history(t, keep_versions=5)
    assert tx.resolve_txns(t) == {"epoch-sink": 49}


def test_cdf_replication_mirrors_upstream(spark, tmp_path):
    """apply_changes / cdf_replicate_sink: the downstream table stays
    ROW-IDENTICAL to the upstream through appends, DV deletes, rewrite
    deletes and merges (updates = delete+insert at one version, the
    insert-outranks-delete rule), each range one destination commit,
    replays no-ops via the watermark."""
    from etl_sentinel_imagery_spark.operators.txlog import (
        history,
        merge_upsert,
    )
    from etl_sentinel_imagery_spark.streaming.cdf_source import (
        cdf_replicate_sink,
    )

    src = str(tmp_path / "rsrc")
    dst = str(tmp_path / "rdst")
    ckpt = str(tmp_path / "rck")
    sink = cdf_replicate_sink(dst, "doc_id")

    def mirror_ok():
        a = sorted(map(tuple, snapshot(spark, src).collect()))
        b = sorted(map(tuple, snapshot(spark, dst).collect()))
        assert a == b

    init_table(spark, src, _seed(spark, 50).repartition(3))
    drain_table_changes(spark, src, ckpt, sink)
    mirror_ok()

    append(spark, src, _seed(spark, 20, offset=100))
    delete_rows_dv(spark, src, "doc_id", [3, 104])
    merge_upsert(
        spark,
        src,
        spark.createDataFrame(
            [(7, 99, 700), (500, 99, 5000)], ["doc_id", "grp", "val"]
        ).withColumn("val", F.col("val").cast("long")),
        "doc_id",
    )
    delete_rows(spark, src, "doc_id", [11])  # rewrite form
    n_dst_commits = len(history(dst))
    drain_table_changes(spark, src, ckpt, sink)
    mirror_ok()
    # the whole multi-commit range applied as ONE destination commit
    assert len(history(dst)) == n_dst_commits + 1
    assert history(dst)[-1]["op"].startswith("cdf_apply_")
    # the update really updated (no stale pre-image, no duplicate key)
    row = snapshot(spark, dst).filter("doc_id = 7").collect()
    assert len(row) == 1 and row[0]["grp"] == 99

    # replayed range is a no-op (fresh sink object, same checkpoint
    # range re-fed by hand)
    feed = table_changes(spark, src, 0)
    before = len(history(dst))
    cdf_replicate_sink(dst, "doc_id")(feed, (0, current_version(src)))
    assert len(history(dst)) == before
    mirror_ok()

    # keep mirroring through another wave incl. compaction (skipped)
    compact(spark, src, target_files=2)
    append(spark, src, _seed(spark, 5, offset=900))
    drain_table_changes(spark, src, ckpt, sink)
    mirror_ok()


def test_filtered_replication_derived_silver(spark, tmp_path):
    """cdf_replicate_sink with a transform: a quality-filtered silver
    table derived in ONE commit per range — upstream deletes and
    updates propagate, rows the filter rejects never appear, and a
    row whose update crosses the filter boundary appears/disappears
    accordingly."""
    from etl_sentinel_imagery_spark.operators.txlog import merge_upsert
    from etl_sentinel_imagery_spark.streaming.cdf_source import (
        cdf_replicate_sink,
    )

    src = str(tmp_path / "fsrc")
    dst = str(tmp_path / "fdst")
    ckpt = str(tmp_path / "fck")

    def only_good_inserts(changes):
        return changes.where(
            (F.col("_change_type") == "delete") | (F.col("grp") >= 3)
        )

    sink = cdf_replicate_sink(
        dst, "doc_id", transform=only_good_inserts
    )

    init_table(spark, src, _seed(spark, 50))  # grp = doc_id % 5
    drain_table_changes(spark, src, ckpt, sink)

    def want():
        return sorted(
            map(
                tuple,
                snapshot(spark, src).filter("grp >= 3").collect(),
            )
        )

    assert sorted(map(tuple, snapshot(spark, dst).collect())) == want()

    # update doc 3 (grp 3 → 1): it must DISAPPEAR from silver;
    # update doc 6 (grp 1 → 4): it must APPEAR
    merge_upsert(
        spark,
        src,
        spark.createDataFrame(
            [(3, 1, 999), (6, 4, 999)], ["doc_id", "grp", "val"]
        ).withColumn("val", F.col("val").cast("long")),
        "doc_id",
    )
    delete_rows_dv(spark, src, "doc_id", [4, 9])  # one in, one out
    drain_table_changes(spark, src, ckpt, sink)
    got = sorted(map(tuple, snapshot(spark, dst).collect()))
    assert got == want()
    ids = {r[0] for r in got}
    assert 6 in ids and 3 not in ids and 4 not in ids and 9 not in ids


def test_max_files_chunks_the_feed(spark, tmp_path):
    """maxFilesPerTrigger on the foreachBatch wrapper: ranges clamp
    where pending added files cross the cap; nothing is dropped."""
    src = str(tmp_path / "mfsrc")
    ckpt = str(tmp_path / "mfck")
    init_table(spark, src, _seed(spark, 5).coalesce(1))
    for i in range(3):
        append(
            spark, src, _seed(spark, 5, offset=5 * (i + 1)).coalesce(2)
        )
    rows = []
    ranges = drain_table_changes(
        spark,
        src,
        ckpt,
        lambda df, rng: rows.extend(tuple(r) for r in df.collect()),
        max_files=2,
    )
    assert len(ranges) >= 3  # 2-file commits chunk one per batch
    assert sorted(rows) == sorted(
        tuple(r) for r in table_changes(spark, src, -1).collect()
    )
