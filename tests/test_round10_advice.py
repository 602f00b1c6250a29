"""Round-9 ADVICE regression tests.

1. (medium) ``ivfpq_topk`` resolves the layout manifest ONCE and pins
   both the model and the code-file list to that snapshot — a rebuild
   flip landing mid-call can no longer pair one generation's codes
   with another generation's codebooks.
2. (low) partition ``col=value`` segments are built with Spark's hive
   path escaping everywhere txlog compares a logical partition spec
   against on-disk paths — escaped values (':' → %3A, NULL →
   __HIVE_DEFAULT_PARTITION__) no longer misclassify staged files as
   strays or silently skip retirement/pruning.
3. (low) ``vacuum_layout`` never reclaims an IN-FLIGHT rebuild's
   model dir, however long the encode takes: an unreferenced ``v_*``
   stamped after the live pointer's last flip is a publisher still in
   flight, not an orphan.
"""

from __future__ import annotations

import os
import time

import numpy as np
import pytest
from pyspark.sql import functions as F

from etl_sentinel_imagery_spark.operators import similarity
from etl_sentinel_imagery_spark.operators.ivfpq import (
    ivfpq_topk,
    rebuild_ivfpq_index,
    write_ivfpq_index,
)
from etl_sentinel_imagery_spark.operators.kmeans import fit as kmeans_fit
from etl_sentinel_imagery_spark.operators.similarity import (
    train_pq_codebooks,
    vacuum_layout,
)
from etl_sentinel_imagery_spark.operators.txlog import (
    _part_seg,
    current_version,
    drop_partition,
    init_table,
    overwrite_table,
    snapshot_partition,
    snapshot,
)

DIM = 16
N = 120


# ---------------------------------------------------------------- hive escaping


SPECIAL_VALUES = [
    "a:b",          # ':' — the ADVICE example
    "x/y",          # '/' would otherwise split the path
    "c d",          # space (NOT escaped by Spark on posix — parity check)
    "p%q",          # '%' must escape or unquote round-trips wrong
    "e=f",          # '=' inside the value
    "he#llo",       # '#'
    None,           # NULL → __HIVE_DEFAULT_PARTITION__
]


def test_part_seg_matches_spark_hive_escaping(spark, tmp_path):
    """Empirical parity: for every special value, _part_seg reproduces
    byte-for-byte the directory segment Spark's partitioned write puts
    on disk (ExternalCatalogUtils.escapePathName semantics)."""
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(SPECIAL_VALUES)],
        "id int, grp string",
    )
    out = str(tmp_path / "esc")
    df.coalesce(1).write.partitionBy("grp").parquet(out)
    on_disk = sorted(
        d for d in os.listdir(out)
        if d.startswith("grp=") and os.path.isdir(os.path.join(out, d))
    )
    ours = sorted(_part_seg("grp", v) for v in SPECIAL_VALUES)
    assert ours == on_disk, f"\nours:  {ours}\ndisk:  {on_disk}"


def _seed_special(spark):
    rows = [
        (i, v)
        for i, v in enumerate(v for v in SPECIAL_VALUES if v is not None)
        for _ in range(3)
    ]
    return spark.createDataFrame(rows, "id int, grp string")


def test_overwrite_partition_with_escaped_value(spark, tmp_path):
    """replaceWhere on a ':'-valued partition: before the fix every
    staged file registered as a stray (raise + unstage); now the
    overwrite commits, retires exactly the old files of that
    partition, and leaves the other partitions untouched."""
    d = str(tmp_path / "ovw_esc")
    init_table(
        spark, d, _seed_special(spark).repartition(2),
        partition_cols=["grp"],
    )
    src = spark.createDataFrame(
        [(100, "a:b"), (101, "a:b")], "id int, grp string"
    )
    overwrite_table(spark, d, src, partition={"grp": "a:b"})
    rows = sorted(
        (r["id"], r["grp"]) for r in snapshot(spark, d).collect()
    )
    got_ab = [r for r in rows if r[1] == "a:b"]
    assert got_ab == [(100, "a:b"), (101, "a:b")], got_ab
    # other escaped partitions untouched
    assert sum(1 for r in rows if r[1] == "x/y") == 3
    # strays still refuse: rows outside the named escaped partition
    v = current_version(d)
    with pytest.raises(ValueError, match="outside the overwritten"):
        overwrite_table(
            spark, d,
            spark.createDataFrame([(7, "x/y")], "id int, grp string"),
            partition={"grp": "a:b"},
        )
    assert current_version(d) == v


def test_partition_read_and_drop_with_escaped_value(spark, tmp_path):
    """Partition-pruned reads and drop_partition resolve escaped
    values: pruning selects the right files (not zero), and the drop
    removes exactly that partition."""
    d = str(tmp_path / "drop_esc")
    init_table(
        spark, d, _seed_special(spark).repartition(2),
        partition_cols=["grp"],
    )
    df, stats = snapshot_partition(spark, d, {"grp": "a:b"})
    assert df.count() == 3
    assert 0 < stats["files_read"] < stats["files_total"]

    drop_partition(d, {"grp": "e=f"})
    left = sorted(set(r["grp"] for r in snapshot(spark, d).collect()))
    assert "e=f" not in left and "a:b" in left


# ------------------------------------------------- ivfpq pinned generation


@pytest.fixture(scope="module")
def pq_corpus(spark):
    rng = np.random.default_rng(101)
    centers = rng.normal(size=(4, DIM))
    vecs = np.stack(
        [centers[i % 4] + 0.2 * rng.normal(size=DIM) for i in range(N)]
    )
    emb = spark.createDataFrame(
        [(i, vecs[i].tolist()) for i in range(N)],
        "vec_id bigint, embedding array<double>",
    )
    return emb, vecs


def _topk_rows(spark, path, emb, k=3):
    out = ivfpq_topk(
        spark, path, emb.filter(F.col("vec_id") < 4), k=k, n_probe=4
    ).collect()
    return sorted(
        (r["query_id"], r["cand_id"], round(r["adc_dist"], 9))
        for r in out
    )


def test_ivfpq_topk_pins_one_generation(spark, pq_corpus, tmp_path, monkeypatch):
    """A rebuild flip landing between the model resolution and the
    code scan must NOT mix generations: the call pins the manifest it
    first resolved, answers exactly as a quiescent pre-flip call, and
    resolves the manifest exactly once."""
    emb, _ = pq_corpus
    path = str(tmp_path / "pinned")
    cents, _ = kmeans_fit(emb, k=4, n_iter=4, init="first_k")
    books1 = train_pq_codebooks(emb, m=4, k=16)
    write_ivfpq_index(emb, cents, books1, path)
    baseline = _topk_rows(spark, path, emb)

    # second generation with materially different codebooks
    books2 = train_pq_codebooks(
        emb.withColumn(
            "embedding",
            F.transform("embedding", lambda x: x * F.lit(-1.0)),
        ),
        m=4, k=16,
    )

    real = similarity._live_layout_meta
    calls = {"n": 0, "flipped": False}

    def spy(p):
        meta = real(p)
        calls["n"] += 1
        if not calls["flipped"]:
            calls["flipped"] = True
            # the adversarial interleaving: a retrain-rebuild publishes
            # a NEW generation right after this resolution returns
            monkeypatch.setattr(similarity, "_live_layout_meta", real)
            rebuild_ivfpq_index(emb, cents, books2, path)
            monkeypatch.setattr(similarity, "_live_layout_meta", spy)
        return meta

    monkeypatch.setattr(similarity, "_live_layout_meta", spy)
    mid_flip = _topk_rows(spark, path, emb)
    monkeypatch.setattr(similarity, "_live_layout_meta", real)

    assert calls["n"] == 1, (
        f"ivfpq_topk resolved the live manifest {calls['n']} times — "
        "must pin ONE snapshot"
    )
    assert mid_flip == baseline, (
        "mid-flip answers diverged from the pinned pre-flip generation"
    )
    # sanity: the flip really changed answers (the test isn't vacuous)
    post = _topk_rows(spark, path, emb)
    assert post != baseline


# ------------------------------------------------- vacuum vs in-flight model


def test_vacuum_spares_inflight_rebuild_model(spark, pq_corpus, tmp_path):
    """A v_* model dir written before a LONG encode (older than the
    age gate, unreferenced by any manifest) survives vacuum as long as
    no later flip has landed; a crashed orphan predating the current
    flip is still reclaimed once aged."""
    emb, _ = pq_corpus
    path = str(tmp_path / "vac")
    cents, _ = kmeans_fit(emb, k=4, n_iter=4, init="first_k")
    books = train_pq_codebooks(emb, m=4, k=16)
    write_ivfpq_index(emb, cents, books, path)

    from etl_sentinel_imagery_spark.operators.ivfpq import _save_model

    # simulate rebuild_ivfpq_index mid-encode: model saved (flip
    # deferred), encode "running" long enough that the dir ages past
    # the gate
    vname = _save_model(path, cents, books, None, flip=False)
    vdir = os.path.join(path, "_model", vname)
    old = time.time() - 7200
    os.utime(vdir, (old, old))
    for fn in os.listdir(vdir):
        os.utime(os.path.join(vdir, fn), (old, old))
    # ...but the live pointer's flip is OLDER still (it predates the
    # rebuild's start, as it always does for a rebuild of an existing
    # layout)
    ptr = os.path.join(path, "_live", "_CURRENT")
    if not os.path.isfile(ptr):  # layout dir name is an impl detail
        cand = [
            os.path.join(path, d, "_CURRENT")
            for d in os.listdir(path)
            if d.startswith("_")
            and os.path.isfile(os.path.join(path, d, "_CURRENT"))
        ]
        ptr = cand[0]
    older = old - 7200
    os.utime(ptr, (older, older))

    removed = vacuum_layout(path, min_age_seconds=3600)
    assert os.path.isdir(vdir), (
        f"vacuum reclaimed an in-flight rebuild's model: {removed}"
    )

    # the rebuild completes: its publish names the model, flip lands
    rebuild_ivfpq_index(emb, cents, books, path)
    assert os.path.isdir(vdir) or True  # vname now retired-unreferenced

    # a crashed orphan OLDER than the (new) current flip, aged past
    # the gate, does get reclaimed
    orphan = _save_model(path, cents, books, None, flip=False)
    odir = os.path.join(path, "_model", orphan)
    os.utime(odir, (old, old))
    for fn in os.listdir(odir):
        os.utime(os.path.join(odir, fn), (old, old))
    removed = vacuum_layout(path, min_age_seconds=3600)
    assert not os.path.isdir(odir), "aged orphan model not reclaimed"
