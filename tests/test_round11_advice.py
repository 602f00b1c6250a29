"""Round-11 regressions: the five round-10 ADVICE findings plus the
verdict's COPY-ledger keying item.

1. concurrent COPY INTO cannot double-load (commit-path ledger
   re-check, first attempt AND rebase) — ADVICE medium;
2. auto-compact failures never fail an already-committed append —
   ADVICE medium;
3. a FRESH stream's first micro-batch honors the admission caps —
   ADVICE low;
4. upgrade_protocol is itself write-gated — ADVICE low;
5. temperature_mix raises on NULL sources (and reports per-source
   counts) — ADVICE low + verdict #7;
6. the COPY ledger survives a landing-dir move (relative+size keys) —
   verdict #6.
"""

from __future__ import annotations

import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from etl_sentinel_imagery_spark.operators import txlog as tx
from etl_sentinel_imagery_spark.operators.txlog import (
    append,
    copy_into,
    current_version,
    init_table,
    resolve_copy_ledger,
    snapshot,
    upgrade_protocol,
)


def _src_file(d: str, name: str, ids):
    os.makedirs(d, exist_ok=True)
    p = os.path.join(d, name)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(list(ids), pa.int64()),
                "body": pa.array([f"b{i}" for i in ids], pa.string()),
            }
        ),
        p,
    )
    return p


def _seed(spark, n=5, offset=0):
    return spark.range(offset, offset + n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("t"), F.col("id")).alias("body"),
    )


# ---------------------------------------------------------------- #
# 1. concurrent COPY INTO — exactly-once under the race             #
# ---------------------------------------------------------------- #


def test_concurrent_copy_into_rebase_path(spark, tmp_path, monkeypatch):
    """Loser stages, then a concurrent COPY commits → loser's claim
    loses, its rebase must NOT re-commit the same files: the ledger
    re-check fires, copy_into restarts against the fresh ledger and
    no-ops. Rows land exactly once."""
    src = str(tmp_path / "landing")
    _src_file(src, "a.parquet", range(10))
    _src_file(src, "b.parquet", range(10, 15))
    t = str(tmp_path / "tbl")
    init_table(spark, t, _seed(spark, 0))

    real_move = tx._move_in_data_files
    state = {"raced": False}

    def racing_move(*a, **kw):
        if not state["raced"]:
            state["raced"] = True
            # the concurrent winner lands while we are staging
            _, w = copy_into(spark, t, src)
            assert w["files_loaded"] == 2
        return real_move(*a, **kw)

    monkeypatch.setattr(tx, "_move_in_data_files", racing_move)
    v, stats = copy_into(spark, t, src)
    assert stats["files_loaded"] == 0
    assert stats["files_skipped"] == 2
    got = snapshot(spark, t)
    assert got.count() == 15  # each row exactly once
    assert got.groupBy("doc_id").count().filter("count > 1").count() == 0


def test_concurrent_copy_into_pre_claim_path(spark, tmp_path, monkeypatch):
    """Winner lands AFTER the loser's ledger read but BEFORE the
    loser's append resolves its parent: the pre-first-attempt ledger
    check (not a claim race) must catch it."""
    src = str(tmp_path / "landing")
    _src_file(src, "a.parquet", range(8))
    t = str(tmp_path / "tbl")
    init_table(spark, t, _seed(spark, 0))

    real_defaults = tx.apply_column_defaults
    state = {"raced": False}

    def racing_defaults(spark_, table_dir, df):
        if not state["raced"]:
            state["raced"] = True
            copy_into(spark_, table_dir, src)
        return real_defaults(spark_, table_dir, df)

    monkeypatch.setattr(tx, "apply_column_defaults", racing_defaults)
    _, stats = copy_into(spark, t, src)
    assert stats["files_loaded"] == 0
    assert snapshot(spark, t).count() == 8


def test_force_copy_still_duplicates_on_purpose(spark, tmp_path):
    """force=True disables the guard by design: duplicates are the
    requested behavior."""
    src = str(tmp_path / "landing")
    _src_file(src, "a.parquet", range(4))
    t = str(tmp_path / "tbl")
    init_table(spark, t, _seed(spark, 0))
    copy_into(spark, t, src)
    _, stats = copy_into(spark, t, src, force=True)
    assert stats["files_loaded"] == 1
    assert snapshot(spark, t).count() == 8


# ---------------------------------------------------------------- #
# 2. auto-compact is best-effort for EVERY failure kind             #
# ---------------------------------------------------------------- #


def test_auto_compact_failure_never_fails_the_append(
    spark, tmp_path, monkeypatch
):
    t = str(tmp_path / "tbl")
    init_table(spark, t, _seed(spark, 1))
    tx.set_properties(
        t,
        {
            "optimize.auto_compact": "true",
            "optimize.auto_compact_min_files": "1",
        },
    )

    def boom(*a, **kw):
        raise RuntimeError("executor lost")

    monkeypatch.setattr(tx, "optimize_small_files", boom)
    before = current_version(t)
    v = append(spark, t, _seed(spark, 3, offset=100))
    assert v == before + 1  # commit stands, maintenance failure swallowed
    assert snapshot(spark, t).count() == 4


# ---------------------------------------------------------------- #
# 3. fresh stream: first micro-batch is capped                      #
# ---------------------------------------------------------------- #


def test_fresh_stream_first_batch_capped(spark, tmp_path):
    from etl_sentinel_imagery_spark.sources.txlog_stream import (
        TxlogChangesStreamReader,
    )

    d = str(tmp_path / "tbl")
    init_table(spark, d, _seed(spark, 10).coalesce(1))
    for i in range(4):  # backlog: v1..v4, two files each
        append(
            spark, d, _seed(spark, 10, offset=10 * (i + 1)).coalesce(2)
        )

    r = TxlogChangesStreamReader(
        None, {"path": d, "maxfilespertrigger": "3"}
    )
    # fresh stream: Spark calls initialOffset first — it seeds the
    # admission cursor, so the FIRST latestOffset is already clamped
    assert r.initialOffset() == {"version": -1}
    # v0 (1 file) + v1 (2 files) = 3 ≤ 3; +v2 exceeds → clamp at v1
    assert r.latestOffset() == {"version": 1}
    r.partitions({"version": -1}, {"version": 1})
    assert r.latestOffset() == {"version": 2}

    # a degenerate/replayed batch never moves the cursor backwards
    r.partitions({"version": 2}, {"version": 1})
    assert r._cursor == 2


# ---------------------------------------------------------------- #
# 4. upgrade_protocol is write-gated                                #
# ---------------------------------------------------------------- #


def test_upgrade_protocol_respects_write_gate(spark, tmp_path, monkeypatch):
    t = str(tmp_path / "tbl")
    init_table(spark, t, _seed(spark, 1))
    # a FUTURE build stamps a level past this one (the issuing build
    # refuses to stamp levels it cannot itself serve — round-11
    # advice — so the stamp impersonates a newer build)
    with monkeypatch.context() as m:
        m.setattr(tx, "SUPPORTED_WRITER", tx.SUPPORTED_WRITER + 1)
        upgrade_protocol(t, min_writer=tx.SUPPORTED_WRITER)
    # the table now requires a newer writer: THIS engine may not
    # write — not even another protocol bump
    with pytest.raises(ValueError, match="writer protocol"):
        upgrade_protocol(t, min_writer=tx.SUPPORTED_WRITER)


# ---------------------------------------------------------------- #
# 5. temperature_mix: NULL sources raise; report counts             #
# ---------------------------------------------------------------- #


def test_temperature_mix_null_source_raises(spark):
    from etl_sentinel_imagery_spark.operators.sampling import (
        temperature_mix,
    )

    df = spark.createDataFrame(
        [(1, "wiki"), (2, None), (3, "crawl")], "doc_id long, src string"
    )
    with pytest.raises(ValueError, match="NULL 'src'"):
        temperature_mix(df, "src", "doc_id", alpha=0.5)


def test_temperature_mix_report_counts(spark):
    from etl_sentinel_imagery_spark.operators.sampling import (
        temperature_mix,
    )

    df = spark.range(1000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 900, "big").otherwise("small").alias("src"),
    )
    report: dict = {}
    out = temperature_mix(df, "src", "doc_id", alpha=0.0, seed="r", report=report)
    assert report["source_counts"] == {"big": 900, "small": 100}
    assert report["fractions"]["small"] == 1.0
    kept = {
        r[0]: r[1] for r in out.groupBy("src").count().collect()
    }
    assert report["kept_by_source"] == kept
    assert kept["small"] == 100  # binding source keeps 100%


def test_curate_corpus_mix_temperature_null_source_raises(spark, tmp_path):
    from etl_sentinel_imagery_spark.plans.corpus_pipeline import (
        CurationConfig,
        curate_corpus,
    )

    docs = spark.createDataFrame(
        [(1, "x y z", None), (2, "a b c", "wiki")],
        "doc_id long, body string, source string",
    )
    with pytest.raises(ValueError, match="NULL 'source'"):
        curate_corpus(
            spark,
            docs,
            str(tmp_path / "out"),
            cfg=CurationConfig(mix_temperature=0.5),
        )


# ---------------------------------------------------------------- #
# 6. COPY ledger survives a landing-dir move (remount)              #
# ---------------------------------------------------------------- #


def test_copy_ledger_survives_landing_dir_move(spark, tmp_path):
    src = str(tmp_path / "landing")
    _src_file(src, "a.parquet", range(6))
    _src_file(src, "b.parquet", range(6, 9))
    t = str(tmp_path / "tbl")
    init_table(spark, t, _seed(spark, 0))
    copy_into(spark, t, src)
    assert snapshot(spark, t).count() == 9

    moved = str(tmp_path / "mnt" / "landing")
    os.makedirs(os.path.dirname(moved))
    shutil.move(src, moved)
    _, stats = copy_into(spark, t, moved)
    assert stats == {
        "files_matched": 2,
        "files_loaded": 0,
        "files_skipped": 2,
    }
    assert snapshot(spark, t).count() == 9

    # distinct landing dirs sharing a NAME but not content don't mask
    other = str(tmp_path / "other")
    _src_file(other, "a.parquet", range(100, 110))  # different size
    _, stats = copy_into(spark, t, other)
    assert stats["files_loaded"] == 1
    assert snapshot(spark, t).count() == 19


# ---------------------------------------------------------------- #
# 7. object-store FS seam (round-10 verdict #2)                     #
# ---------------------------------------------------------------- #


def test_simulated_object_store_fs_semantics(tmp_path):
    """move is copy+delete (no rename) and PUT files lag out of
    listings for list_lag calls — GET/stat stay strongly consistent."""
    fs = tx.SimulatedObjectStoreFS(list_lag=2)
    src = str(tmp_path / "a.bin")
    dst = str(tmp_path / "b.bin")
    with open(src, "wb") as f:
        f.write(b"payload")
    fs.move(src, dst)
    assert not os.path.exists(src)
    assert open(dst, "rb").read() == b"payload"  # GET consistent
    assert fs.getsize(dst) == 7  # stat consistent
    # LIST lags two observations behind the write
    assert dst not in fs.glob(str(tmp_path / "*.bin"))
    assert "b.bin" not in fs.listdir(str(tmp_path))
    assert dst in fs.glob(str(tmp_path / "*.bin"))


def test_copy_into_under_listing_lag_never_duplicates(
    spark, tmp_path, monkeypatch
):
    """A landing file invisible to the first LIST simply loads on a
    later call — delayed, never lost, never doubled."""
    t = str(tmp_path / "tbl")
    init_table(spark, t, _seed(spark, 0))
    src = str(tmp_path / "landing")
    os.makedirs(src)
    fs = tx.SimulatedObjectStoreFS(list_lag=2)
    monkeypatch.setattr(tx, "_TABLE_FS", fs)

    # the uploader PUTs through the store: subject to listing lag
    staged = str(tmp_path / "upload.parquet")
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table({"doc_id": pa.array(range(5), pa.int64()),
                  "body": pa.array([f"b{i}" for i in range(5)])}),
        staged,
    )
    fs.move(staged, os.path.join(src, "f.parquet"))

    _, s1 = copy_into(spark, t, src)  # lagging list: not visible yet
    assert s1 == {
        "files_matched": 0, "files_loaded": 0, "files_skipped": 0,
    }
    copy_into(spark, t, src)  # second observation still lagged
    _, s3 = copy_into(spark, t, src)  # now visible → loads once
    assert s3["files_loaded"] == 1
    _, s4 = copy_into(spark, t, src)
    assert s4["files_loaded"] == 0  # ledger no-op
    assert snapshot(spark, t).count() == 5


# ---------------------------------------------------------------- #
# 8. ANN query-batch collects are size-asserted                     #
# ---------------------------------------------------------------- #


def test_ann_query_batch_cap(spark, monkeypatch):
    """Round-10 verdict #8: every serving entry point that collects
    the query side refuses a corpus-sized frame with a clear error
    instead of a driver OOM."""
    import numpy as np

    from etl_sentinel_imagery_spark.operators import similarity as sim

    emb = spark.range(50).select(
        F.col("id").alias("vec_id"),
        F.array(
            (F.col("id") % 7).cast("double"),
            (F.col("id") % 3).cast("double"),
            F.lit(1.0),
        ).alias("embedding"),
    )
    monkeypatch.setattr(sim, "ANN_QUERY_BATCH_MAX", 10)
    cents = np.eye(3)[:2]
    with pytest.raises(ValueError, match="ANN_QUERY_BATCH_MAX"):
        sim.brute_force_topk_gemm(emb, emb, k=2)
    # under the cap everything serves normally
    small = emb.limit(4)
    assert sim.brute_force_topk_gemm(emb, small, k=2).count() == 8
    monkeypatch.undo()


def test_concurrent_copy_into_true_threads(spark, tmp_path):
    """The REAL race, not a monkeypatched one: four threads run
    copy_into on the same landing dir simultaneously. Whatever
    interleaving the scheduler picks, the invariants hold: every
    source row lands EXACTLY once, the ledger covers every file, and
    the per-run stats sum to one full load."""
    import threading

    src = str(tmp_path / "landing")
    for i in range(6):
        _src_file(src, f"f{i}.parquet", range(i * 10, i * 10 + 10))
    t = str(tmp_path / "tbl")
    init_table(spark, t, _seed(spark, 0))

    results: list = []
    errors: list = []

    def run():
        try:
            _, stats = copy_into(spark, t, src)
            results.append(stats)
        except Exception as exc:  # noqa: BLE001 — surface in assert
            errors.append(exc)

    threads = [threading.Thread(target=run) for _ in range(4)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errors, errors
    got = snapshot(spark, t)
    assert got.count() == 60
    assert got.groupBy("doc_id").count().filter("count > 1").count() == 0
    assert sum(s["files_loaded"] for s in results) == 6
    assert len(resolve_copy_ledger(t)) == 6
    # idempotent afterwards
    _, s = copy_into(spark, t, src)
    assert s["files_loaded"] == 0


# ---------------------------------------------------------------- #
# round-11 review findings                                          #
# ---------------------------------------------------------------- #


def test_budget_stages_do_not_degenerate_split(spark, tmp_path):
    """Review finding (high): budget samplers seeded with the RAW
    split_seed keep exactly the low-bucket docs assign_split later
    thresholds on — every survivor would label 'train' and val/test
    would be silently EMPTY. The stages now derive their seeds, so a
    budgeted corpus still spans splits. Deterministic: every hash is
    a pure function of fixed seeds."""
    from etl_sentinel_imagery_spark.plans.corpus_pipeline import (
        CurationConfig,
        curate_corpus,
    )

    docs = spark.range(300).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(0), F.lit(5)),
                lambda i: F.concat(
                    F.lit("w"), F.col("id").cast("string"),
                    F.lit("x"), i.cast("string"),
                ),
            ),
        ).alias("text"),
    )
    out = str(tmp_path / "out")
    curate_corpus(
        spark, docs, out,
        cfg=CurationConfig(max_tokens=900, min_tokens=1),
    )
    splits = {
        r["split"]
        for r in spark.read.parquet(f"{out}/documents")
        .select("split").distinct().collect()
    }
    assert len(splits) >= 2, f"token budget degenerated split: {splits}"

    out2 = str(tmp_path / "out2")
    curate_corpus(
        spark, docs, out2,
        cfg=CurationConfig(max_docs=150, min_tokens=1),
    )
    splits2 = {
        r["split"]
        for r in spark.read.parquet(f"{out2}/documents")
        .select("split").distinct().collect()
    }
    assert len(splits2) >= 2, f"doc cap degenerated split: {splits2}"


def test_copy_glob_dir_wildcards_single_call_loads_all(spark, tmp_path):
    """A glob whose DIRECTORY part carries wildcards: same-named
    same-size files in different matched dirs are distinct paths in
    ONE listing, so one call loads BOTH — and the replay no-ops.
    (Round 12 rekeyed the ledger to the invocation-invariant
    ``parent_leaf/basename#size`` form — round-11 advice, medium —
    so the two files now share a ledger key; the documented residual
    collision. Within a call that changes nothing; across calls the
    second same-leaf dir would be skipped, the accepted trade for
    keys that survive switching invocation forms.)"""
    for batch in ("b1", "b2"):
        _src_file(
            str(tmp_path / batch / "land"), "part.parquet", range(5)
        )  # identical size by construction, different dirs
    t = str(tmp_path / "tbl")
    init_table(spark, t, _seed(spark, 0))
    pat = str(tmp_path / "*" / "land" / "*.parquet")
    _, stats = copy_into(spark, t, pat)
    assert stats["files_loaded"] == 2
    assert snapshot(spark, t).count() == 10
    led = resolve_copy_ledger(t)
    assert {k.split("#")[0] for k in led} == {"land/part.parquet"}
    _, stats = copy_into(spark, t, pat)  # replay no-ops
    assert stats["files_loaded"] == 0
    # ...and so does the DIRECT-dir form over either matched dir —
    # the invariance the rekey exists to provide
    _, stats = copy_into(spark, t, str(tmp_path / "b1" / "land"))
    assert stats["files_loaded"] == 0
