"""MemoryLogStore: the commit protocol on NON-POSIX (object-store)
semantics — CAS-arbitrated claims, payload-carrying records, lossy
pointer PUTs (round-4 verdict #5). The multi-process POSIX race stays
in test_txlog; here the SAME race invariants parametrize over both
stores, and each injected failure mode must leave the log
recoverable."""

from __future__ import annotations

import json
import os

import pytest

from etl_sentinel_imagery_spark.operators import txlog as tx


def _bare_table(t: str) -> None:
    os.makedirs(tx._log_dir(t), exist_ok=True)
    with open(tx._manifest_path(t, 0), "w") as f:
        json.dump(
            {"version": 0, "parent": None, "op": "init",
             "stat_cols": [], "partition_cols": [], "files": []},
            f,
        )
    with open(os.path.join(tx._log_dir(t), "_CURRENT"), "w") as f:
        f.write("0")


@pytest.mark.parametrize("store_kind", ["posix", "memory"])
def test_threaded_race_same_invariants_on_both_stores(
    tmp_path, store_kind
):
    """4 threads × 10 commits with retry-on-conflict: every commit
    lands exactly once, the history is gapless, every writer's files
    resolve — identical invariants whichever store arbitrates (the
    multi-process POSIX variant lives in test_txlog)."""
    from concurrent.futures import ThreadPoolExecutor

    t = str(tmp_path / "race")
    _bare_table(t)
    store = (
        tx.PosixLogStore() if store_kind == "posix" else tx.MemoryLogStore()
    )
    tx.set_log_store(store)

    def writer(wid: int) -> int:
        conflicts = 0
        for i in range(10):
            while True:
                parent = tx.current_version(t)
                try:
                    tx._commit_delta(
                        t, parent, [f"w{wid}-c{i}.parquet"], [],
                        f"op-w{wid}-c{i}",
                    )
                    break
                except tx.TxConflict:
                    conflicts += 1
        return conflicts

    try:
        with ThreadPoolExecutor(max_workers=4) as pool:
            conflicts = list(pool.map(writer, range(4)))
    finally:
        tx.set_log_store(tx.PosixLogStore())

    assert tx.current_version(t) == 40
    ops = [h["op"] for h in tx.history(t)]
    assert len(ops) == 41 and len(set(ops)) == 41
    names = {tx._entry_name(e) for e in tx.resolve_files(t)}
    assert names == {
        f"w{w}-c{i}.parquet" for w in range(4) for i in range(10)
    }
    assert sum(conflicts) >= 0  # contention is timing-dependent here


def test_claim_then_crash_is_recoverable(spark, tmp_path):
    """A writer that wins the CAS but dies before the manifest object
    lands must not wedge or lose the commit: the payload lives in the
    CAS record, the next claim's recover() materializes it, and the
    crashed commit's rows are THERE (its data files landed first)."""
    from pyspark.sql import functions as F

    t = str(tmp_path / "crash")
    store = tx.MemoryLogStore()
    tx.set_log_store(store)
    try:
        df = spark.range(10).select(
            F.col("id").alias("doc_id"), F.lit("x").alias("body")
        )
        tx.init_table(spark, t, df)
        store.crash_after_cas = 1  # arm AFTER init: the append crashes
        with pytest.raises(RuntimeError, match="CAS win"):
            tx.append(
                spark, t,
                spark.range(100, 105).select(
                    F.col("id").alias("doc_id"), F.lit("y").alias("body")
                ),
            )
        # the claimed manifest is not yet on disk — readers see v0
        assert tx.current_version(t) == 0
        # next commit: claim recovers v1 from the CAS record, loses
        # that slot, and REBASES over it (lock-free appends, round 6)
        # — the crashed commit surfaces and the fresh one lands at v2
        # in one call, no conflict reaching the caller
        fresh = spark.range(200, 203).select(
            F.col("id").alias("doc_id"), F.lit("z").alias("body")
        )
        v = tx.append(spark, t, fresh)
        assert v == 2
        snap = tx.snapshot(spark, t)
        assert snap.count() == 18  # 10 + crashed 5 + retried 3
        assert snap.filter("doc_id = 101").count() == 1
        # standalone recover() is idempotent
        assert store.recover() == []
    finally:
        tx.set_log_store(tx.PosixLogStore())


def test_lost_pointer_put_heals(spark, tmp_path):
    """A dropped pointer PUT (lost replace) lags the cache only:
    current_version scan-forward serves the committed version and the
    next successful commit rewrites the pointer."""
    from pyspark.sql import functions as F

    t = str(tmp_path / "lost")
    tx.set_log_store(tx.MemoryLogStore(drop_replaces=1))
    try:
        df = spark.range(5).select(
            F.col("id").alias("doc_id"), F.lit("a").alias("body")
        )
        tx.init_table(spark, t, df)  # this replace is DROPPED
        # the pointer file never landed, but the claim committed v0 —
        # current_version falls back to scanning from the init manifest
        assert not os.path.exists(
            os.path.join(tx._log_dir(t), "_CURRENT")
        )
        assert tx.current_version(t) == 0
        assert tx.snapshot(spark, t).count() == 5
        # now lose a LATER flip
        tx.set_log_store(tx.MemoryLogStore(drop_replaces=1))
        tx.append(spark, t, df)  # v1 commits; its pointer PUT drops
        assert not os.path.exists(
            os.path.join(tx._log_dir(t), "_CURRENT")
        )  # still no cache at all
        assert tx.current_version(t) == 1  # scan-forward heals reads
        tx.append(spark, t, df)  # v2 commits and rewrites the pointer
        with open(os.path.join(tx._log_dir(t), "_CURRENT")) as f:
            assert f.read().strip() == "2"
        assert tx.snapshot(spark, t).count() == 15
    finally:
        tx.set_log_store(tx.PosixLogStore())


def test_spurious_claim_failure_with_idempotence_tag(tmp_path):
    """Object-store timeout shape: the claim LANDS but the caller sees
    failure. A raw retry loop would double-commit new data at the next
    version; the op-tag idempotence check (the streaming sink's
    contract) detects its own landed commit and stops — exactly
    once."""
    t = str(tmp_path / "spur")
    _bare_table(t)
    tx.set_log_store(tx.MemoryLogStore(spurious_claim_failures=1))
    try:
        tag = "batch_7"
        attempts = 0
        while True:
            attempts += 1
            if any(h["op"] == tag for h in tx.history(t)):
                break  # our commit is in history — done, don't re-add
            parent = tx.current_version(t)
            try:
                tx._commit_delta(t, parent, ["b7.parquet"], [], tag)
                break
            except tx.TxConflict:
                continue
        assert attempts == 2  # failed once spuriously, then detected
        assert tx.current_version(t) == 1
        names = [tx._entry_name(e) for e in tx.resolve_files(t)]
        assert names == ["b7.parquet"]  # exactly once
    finally:
        tx.set_log_store(tx.PosixLogStore())
