"""COPY INTO — idempotent file ingestion with a crash-atomic ledger.

The ledger rides the manifest chain exactly like SetTransaction
watermarks: per-commit increments, checkpoint embeddings, horizon
carry. Reference surface: Databricks COPY INTO (dedup by path,
FORCE reload, PATTERN/FILEFORMAT, retention window)."""

from __future__ import annotations

import os

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
    truncate_history,
)
from etl_sentinel_imagery_spark.operators.txlog_sql import tx_sql


def _src_file(d: str, name: str, ids, extra_col: bool = False):
    os.makedirs(d, exist_ok=True)
    cols = {
        "doc_id": pa.array(list(ids), pa.int64()),
        "body": pa.array([f"b{i}" for i in ids], pa.string()),
    }
    if extra_col:
        cols["lang"] = pa.array(["en"] * len(list(ids)), pa.string())
    p = os.path.join(d, name)
    pq.write_table(pa.table(cols), p)
    return p


def _seed(spark, n=5, offset=0):
    return spark.range(offset, offset + n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("t"), F.col("id")).alias("body"),
    )


def test_copy_into_loads_once_then_noops(spark, tmp_path):
    src = str(tmp_path / "landing")
    _src_file(src, "a.parquet", range(10))
    _src_file(src, "b.parquet", range(10, 15))
    t = str(tmp_path / "tbl")
    init_table(spark, t, _seed(spark, 3, offset=1000))

    v, stats = copy_into(spark, t, src)
    assert stats == {
        "files_matched": 2, "files_loaded": 2, "files_skipped": 0,
    }
    assert snapshot(spark, t).count() == 18
    led = resolve_copy_ledger(t)
    # keys are leaf-scoped landing-relative + size-qualified
    # (remount-safe, cross-landing collision-safe)
    assert {k.split("#")[0] for k in led} == {
        "landing/a.parquet", "landing/b.parquet",
    }

    # idempotent: nothing new → no commit at all
    v2, stats2 = copy_into(spark, t, src)
    assert v2 == v and stats2["files_loaded"] == 0
    assert stats2["files_skipped"] == 2
    assert snapshot(spark, t).count() == 18

    # a new drop loads ONLY the new file
    _src_file(src, "c.parquet", range(20, 24))
    v3, stats3 = copy_into(spark, t, src)
    assert v3 == v2 + 1
    assert stats3 == {
        "files_matched": 3, "files_loaded": 1, "files_skipped": 2,
    }
    assert snapshot(spark, t).count() == 22


def test_copy_into_force_reloads(spark, tmp_path):
    src = str(tmp_path / "landing")
    _src_file(src, "a.parquet", range(4))
    t = str(tmp_path / "tbl")
    init_table(spark, t, _seed(spark, 0))
    copy_into(spark, t, src)
    assert snapshot(spark, t).count() == 4
    v, stats = copy_into(spark, t, src, force=True)
    assert stats["files_loaded"] == 1
    assert snapshot(spark, t).count() == 8  # duplicates, by request


def test_copy_into_pattern_and_junk_files(spark, tmp_path):
    src = str(tmp_path / "landing")
    _src_file(src, "a.parquet", range(3))
    _src_file(src, "keep.pq", range(3, 6))
    _src_file(src, "_started.parquet", range(6, 9))  # marker: ignored
    with open(os.path.join(src, "notes.txt"), "w") as f:
        f.write("not data")
    t = str(tmp_path / "tbl")
    init_table(spark, t, _seed(spark, 0))
    v, stats = copy_into(spark, t, src, pattern="*.parquet")
    assert stats["files_matched"] == 1  # marker + txt + .pq excluded
    assert snapshot(spark, t).count() == 3
    v2, stats2 = copy_into(spark, t, src, pattern="*.pq")
    assert stats2["files_loaded"] == 1
    assert snapshot(spark, t).count() == 6


def test_copy_ledger_survives_checkpoints_and_truncate(
    spark, tmp_path
):
    src = str(tmp_path / "landing")
    _src_file(src, "a.parquet", range(6))
    t = str(tmp_path / "tbl")
    init_table(spark, t, _seed(spark, 2, offset=500))
    copy_into(spark, t, src)
    n = snapshot(spark, t).count()
    # drive the chain across a checkpoint boundary
    for i in range(tx.CHECKPOINT_EVERY + 2):
        append(spark, t, _seed(spark, 1, offset=2000 + i))
    _, stats = copy_into(spark, t, src)
    assert stats["files_loaded"] == 0, (
        "ledger lost across checkpoint embedding"
    )
    assert snapshot(spark, t).count() == n + tx.CHECKPOINT_EVERY + 2


def test_copy_ledger_survives_truncate_history(spark, tmp_path):
    src = str(tmp_path / "landing")
    _src_file(src, "a.parquet", range(6))
    t = str(tmp_path / "tbl")
    init_table(spark, t, _seed(spark, 2, offset=500))
    copy_into(spark, t, src)
    for i in range(4):
        append(spark, t, _seed(spark, 1, offset=3000 + i))
    truncate_history(t, keep_versions=1)
    _, stats = copy_into(spark, t, src)
    assert stats["files_loaded"] == 0, (
        "ledger lost across truncate_history horizon"
    )


def test_copy_into_schema_evolution(spark, tmp_path):
    src = str(tmp_path / "landing")
    _src_file(src, "a.parquet", range(3))
    t = str(tmp_path / "tbl")
    init_table(spark, t, _seed(spark, 2, offset=100))
    copy_into(spark, t, src)
    _src_file(src, "b.parquet", range(3, 5), extra_col=True)
    copy_into(spark, t, src)
    snap = snapshot(spark, t)
    assert "lang" in snap.columns
    assert snap.where(F.col("lang").isNull()).count() == 5
    assert snap.where(F.col("lang") == "en").count() == 2


def test_copy_into_sql_route(spark, tmp_path):
    src = str(tmp_path / "landing")
    _src_file(src, "a.parquet", range(7))
    t = str(tmp_path / "tbl")
    init_table(spark, t, _seed(spark, 0))
    v, stats = tx_sql(
        spark,
        f"COPY INTO `{t}` FROM '{src}' FILEFORMAT = PARQUET",
    )
    assert stats["files_loaded"] == 1
    assert snapshot(spark, t).count() == 7
    v2, stats2 = tx_sql(spark, f"COPY INTO `{t}` FROM '{src}'")
    assert v2 == v and stats2["files_loaded"] == 0
    v3, stats3 = tx_sql(
        spark, f"COPY INTO `{t}` FROM '{src}' FORCE = TRUE"
    )
    assert stats3["files_loaded"] == 1
    assert snapshot(spark, t).count() == 14


def test_copy_retention_window_ages_entries_out(spark, tmp_path):
    src = str(tmp_path / "landing")
    _src_file(src, "a.parquet", range(3))
    t = str(tmp_path / "tbl")
    init_table(spark, t, _seed(spark, 0))
    copy_into(spark, t, src)
    tx.set_properties(t, {"copy.retention_seconds": 1e-6})
    # drive to a checkpoint: the embed prunes the aged entry
    while (current_version(t) + 1) % tx.CHECKPOINT_EVERY != 0:
        append(spark, t, _seed(spark, 1, offset=9000))
    append(spark, t, _seed(spark, 1, offset=9100))  # the checkpoint
    assert resolve_copy_ledger(t) == {}
    _, stats = copy_into(spark, t, src)
    assert stats["files_loaded"] == 1  # aged out → loads again


def test_copy_into_csv(spark, tmp_path):
    src = str(tmp_path / "csvland")
    os.makedirs(src)
    with open(os.path.join(src, "a.csv"), "w") as f:
        f.write("doc_id,body\n1,x\n2,y\n")
    t = str(tmp_path / "tbl")
    init_table(
        spark,
        t,
        spark.createDataFrame([], "doc_id long, body string"),
    )
    _, stats = copy_into(
        spark, t, src, pattern="*.csv", fmt="csv",
        options={"header": "true", "inferSchema": "true"},
    )
    assert stats["files_loaded"] == 1
    assert snapshot(spark, t).count() == 2


def test_copy_ledger_parts_scale(spark, tmp_path, monkeypatch):
    """Past COPY_LEDGER_INLINE_MAX the checkpoint-embedded ledger
    moves into immutable parquet SEGMENTS: each checkpoint reuses the
    previous segments verbatim + one churn segment (O(new entries));
    past the segment bound a compaction unions them; resolution,
    dedup, truncate-horizon carry, and vacuum discipline all hold."""
    monkeypatch.setattr(tx, "CHECKPOINT_EVERY", 4)
    monkeypatch.setattr(tx, "COPY_LEDGER_INLINE_MAX", 2)

    src = str(tmp_path / "landing")
    t = str(tmp_path / "tbl")
    init_table(spark, t, _seed(spark, 2, offset=9000))
    made = 0

    def land(n):
        nonlocal made
        for _ in range(n):
            _src_file(src, f"f{made:04d}.parquet", range(made, made + 1))
            made += 1

    # three copies with appends between, crossing checkpoint versions
    seg_histories = []
    for round_ in range(3):
        land(3)
        copy_into(spark, t, src)
        for i in range(4):
            append(
                spark, t, _seed(spark, 1, offset=50_000 + 100 * round_ + i)
            )
        m = tx.read_manifest(
            t, (current_version(t) // 4) * 4
        )  # the latest checkpoint
        if "copy_ledger_parts" in m:
            seg_histories.append(list(m["copy_ledger_parts"]))
    assert seg_histories, "ledger never reached parts scale"
    # segment REUSE: each later checkpoint's list extends the earlier
    for a, b in zip(seg_histories, seg_histories[1:]):
        assert b[: len(a)] == a or len(b) <= len(a)  # reuse or compacted
    # resolution exact at parts scale
    led = resolve_copy_ledger(t)
    assert len(led) == made == 9
    # dedup still holds: a replayed copy loads nothing
    _, stats = copy_into(spark, t, src)
    assert stats["files_loaded"] == 0
    assert snapshot(spark, t).where(F.col("doc_id") < 9).count() == 9

    # compaction: past the segment bound the list collapses to one
    monkeypatch.setattr(tx, "COPY_LEDGER_MAX_SEGMENTS", 1)
    land(1)
    copy_into(spark, t, src)
    while current_version(t) % 4 != 0:
        append(spark, t, _seed(spark, 1, offset=7000 + current_version(t)))
    m = tx.read_manifest(t)
    assert len(m["copy_ledger_parts"]) == 1
    assert len(resolve_copy_ledger(t)) == 10

    # truncate horizon carries the parts reference; vacuum keeps
    # referenced segments and sweeps an orphan
    truncate_history(t, keep_versions=1)
    assert len(resolve_copy_ledger(t)) == 10
    orphan = os.path.join(t, "_txlog", "copy_parts", "seg-orphan.parquet")
    with open(orphan, "wb") as f:
        f.write(b"junk")
    removed = tx.vacuum(t, min_age_seconds=0)
    assert os.path.join("_txlog", "copy_parts", "seg-orphan.parquet") in removed
    assert len(resolve_copy_ledger(t)) == 10
    _, stats = copy_into(spark, t, src)
    assert stats["files_loaded"] == 0


def test_copy_into_identity_table_assigns(spark, tmp_path):
    """COPY on an identity table routes through the assigning append
    (never a silent NULL GENERATED ALWAYS column); files carrying the
    column refuse, like the SQL INSERT route."""
    from etl_sentinel_imagery_spark.operators.txlog import (
        enable_identity,
    )

    src = str(tmp_path / "landing")
    _src_file(src, "a.parquet", range(3))
    t = str(tmp_path / "tbl")
    init_table(
        spark,
        t,
        spark.createDataFrame([], "doc_id long, body string"),
    )
    enable_identity(t, "rid", start=10)
    copy_into(spark, t, src)
    snap = snapshot(spark, t)
    assert sorted(r["rid"] for r in snap.collect()) == [10, 11, 12]
    # a second batch continues the watermark, ledger still dedups
    _src_file(src, "b.parquet", range(3, 5))
    copy_into(spark, t, src)
    assert sorted(
        r["rid"] for r in snapshot(spark, t).collect()
    ) == [10, 11, 12, 13, 14]
    _, stats = copy_into(spark, t, src)
    assert stats["files_loaded"] == 0

    # files CARRYING the identity column refuse
    bad = str(tmp_path / "bad")
    os.makedirs(bad)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([9], pa.int64()),
                "body": pa.array(["x"], pa.string()),
                "rid": pa.array([999], pa.int64()),
            }
        ),
        os.path.join(bad, "c.parquet"),
    )
    import pytest as _pytest

    with _pytest.raises(ValueError, match="GENERATED"):
        copy_into(spark, t, bad)


def test_copy_into_applies_defaults_and_generated(spark, tmp_path):
    """Ingestion honors declared column facilities like the SQL
    INSERT route: omitted DEFAULTs fill, omitted GENERATED columns
    compute, supplied generated values enforce."""
    from etl_sentinel_imagery_spark.operators.txlog import (
        set_column_default,
        set_generated_column,
    )

    src = str(tmp_path / "landing")
    _src_file(src, "a.parquet", range(3))
    t = str(tmp_path / "tbl")
    init_table(
        spark,
        t,
        spark.createDataFrame(
            [],
            "doc_id long, body string, src string, body_len int",
        ),
    )
    set_column_default(spark, t, "src", "'landing'")
    set_generated_column(spark, t, "body_len", "length(body)")
    copy_into(spark, t, src)
    snap = snapshot(spark, t).collect()
    assert all(r["src"] == "landing" for r in snap)
    assert all(r["body_len"] == len(r["body"]) for r in snap)

    # a supplied-but-contradictory generated value refuses
    bad = str(tmp_path / "bad")
    os.makedirs(bad)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([9], pa.int64()),
                "body": pa.array(["xx"], pa.string()),
                "body_len": pa.array([99], pa.int32()),
            }
        ),
        os.path.join(bad, "c.parquet"),
    )
    with pytest.raises(Exception, match="GENERATED ALWAYS"):
        copy_into(spark, t, bad)
