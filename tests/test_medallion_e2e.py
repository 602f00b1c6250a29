"""End-to-end medallion pipeline over the transaction log: the
round's pieces composed — a Structured Streaming EXACTLY-ONCE SINK
feeds bronze, the STREAMING CDF SOURCE tails bronze into a
transformed silver table (also txlog), and silver's change feed folds
into a gold aggregate — with a mid-pipeline restart and a GDPR-style
deletion-vector delete propagating bronze → silver → gold.

This is the Delta bronze→silver→gold pattern with zero continuous
queries: every hop is checkpointed-cursor pull over manifests, every
write is a range-tagged idempotent commit, so the whole pipeline is
crash-replayable at any point.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_sentinel_imagery_spark.operators.txlog import (
    append,
    current_version,
    delete_rows_dv,
    init_table,
    snapshot,
    table_changes,
)
from etl_sentinel_imagery_spark.streaming.cdf_source import (
    cdf_append_sink,
    drain_table_changes,
)


def _batch(spark, n, offset=0):
    return spark.range(offset, offset + n).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 4).cast("int").alias("grp"),
        (F.col("id") % 10).cast("int").alias("quality"),
        (F.col("id") * 3).alias("qty"),
    )


def _silver_hop(spark, bronze, silver, ckpt):
    """Bronze CDF → silver: keep quality >= 5 inserts; bronze deletes
    propagate as silver DV deletes. Each range applies idempotently
    (the insert leg is range-tagged; the delete leg is a no-op on
    replay because the keys are already gone)."""

    def process(changes, rng):
        ins = changes.filter(
            (F.col("_change_type") == "insert") & (F.col("quality") >= 5)
        ).select("doc_id", "grp", "quality", "qty")
        # the delete leg stays DISTRIBUTED: delete_rows_dv takes the
        # key frame directly — a bulk upstream purge never round-trips
        # through the driver
        dels = changes.filter("_change_type = 'delete'").select("doc_id")
        sink = cdf_append_sink(silver)
        sink(ins, rng)
        delete_rows_dv(spark, silver, "doc_id", dels)

    return drain_table_changes(spark, bronze, ckpt, process)


def _gold_fold(spark, silver, gold_ckpt, state):
    """Silver CDF → gold: additive per-grp (n, sum_qty) fold kept in
    a plain dict (stand-in for any idempotent MV store)."""

    def process(changes, rng):
        sign = F.when(
            F.col("_change_type") == "insert", F.lit(1)
        ).otherwise(F.lit(-1))
        for r in (
            changes.groupBy("grp")
            .agg(
                F.sum(sign).alias("dn"),
                F.sum(sign * F.col("qty")).alias("dq"),
            )
            .collect()
        ):
            n, q = state.get(r["grp"], (0, 0))
            state[r["grp"]] = (n + r["dn"], q + (r["dq"] or 0))

    return drain_table_changes(spark, silver, gold_ckpt, process)


def test_bronze_silver_gold_with_restart_and_gdpr_delete(
    spark, tmp_path
):
    bronze = str(tmp_path / "bronze")
    silver = str(tmp_path / "silver")
    b2s = str(tmp_path / "b2s_ckpt")
    s2g = str(tmp_path / "s2g_ckpt")
    gold: dict = {}

    # ingest wave 1 (the exactly-once sink's epoch-tag path is covered
    # in test_streaming; batch commits exercise the same claim
    # machinery without a streaming query per hop)
    init_table(spark, bronze, _batch(spark, 100))
    append(spark, bronze, _batch(spark, 40, offset=500))
    _silver_hop(spark, bronze, silver, b2s)
    _gold_fold(spark, silver, s2g, gold)

    # RESTART: every consumer below re-reads its cursor from disk —
    # nothing in memory carries over except the gold dict (whose
    # idempotence is range-keyed by the cursor, so no range replays)
    append(spark, bronze, _batch(spark, 30, offset=900))
    delete_rows_dv(spark, bronze, "doc_id", [7, 507, 905])  # GDPR keys
    _silver_hop(spark, bronze, silver, b2s)
    _gold_fold(spark, silver, s2g, gold)

    # ground truth: recompute silver/gold from the bronze SNAPSHOT
    want_silver = snapshot(spark, bronze).filter("quality >= 5")
    got_silver = snapshot(spark, silver)
    assert sorted(map(tuple, got_silver.collect())) == sorted(
        map(tuple, want_silver.collect())
    )
    # the GDPR keys are really gone at every layer
    for t in (bronze, silver):
        assert (
            snapshot(spark, t)
            .filter(F.col("doc_id").isin([7, 507, 905]))
            .count()
            == 0
        )
    want_gold = {
        r["grp"]: (r["n"], r["q"])
        for r in want_silver.groupBy("grp")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("qty").alias("q"))
        .collect()
    }
    assert {g: v for g, v in gold.items() if v[0] != 0} == want_gold

    # idempotence under a spurious re-drain: nothing changes
    before = dict(gold)
    _silver_hop(spark, bronze, silver, b2s)
    _gold_fold(spark, silver, s2g, gold)
    assert gold == before
    assert snapshot(spark, silver).count() == want_silver.count()

    # and the silver CDF seen end-to-end equals its snapshot multiset
    sign_fold = (
        table_changes(spark, silver, -1)
        .groupBy("doc_id")
        .agg(
            F.sum(
                F.when(F.col("_change_type") == "insert", 1).otherwise(-1)
            ).alias("net")
        )
        .filter("net != 0")
        .count()
    )
    assert sign_fold == snapshot(spark, silver).count()


def test_upsert_silver_hop_one_merge_per_range(spark, tmp_path):
    """Round-5 verdict #4: the upsert-mode silver hop — each consumed
    bronze CDF range applies as ONE merge_upsert commit
    (cdf_upsert_sink), exactly-once via the SetTransaction watermark.
    The silver table tracks the LATEST state per key: upstream updates
    land, upstream deletes keep the key at its last state (the
    slowly-changing-dimension shape; cdf_replicate_sink is the
    row-identical mirror)."""
    from etl_sentinel_imagery_spark.operators.txlog import (
        history,
        merge_upsert,
        resolve_txns,
    )
    from etl_sentinel_imagery_spark.streaming.cdf_source import (
        CdfCursor,
        cdf_upsert_sink,
        drain_table_changes,
    )
    import json as _json

    bronze = str(tmp_path / "ubronze")
    silver = str(tmp_path / "usilver")
    ckpt = str(tmp_path / "uckpt")
    init_table(spark, bronze, _batch(spark, 50))
    sink = cdf_upsert_sink(silver, "doc_id", app_id="silver-up")
    assert drain_table_changes(spark, bronze, ckpt, sink) == [(-1, 0)]
    assert snapshot(spark, silver).count() == 50

    # upstream UPDATE via merge: silver follows, one commit per range
    upd = _batch(spark, 10, offset=10).withColumn(
        "qty", F.col("qty") + 10000
    )
    merge_upsert(spark, bronze, upd, "doc_id")
    append(spark, bronze, _batch(spark, 5, offset=700))
    n_before = len(history(silver))
    assert drain_table_changes(spark, bronze, ckpt, sink) == [(0, 2)]
    assert len(history(silver)) == n_before + 1  # ONE merge commit
    assert history(silver)[-1]["op"] == "cdf_merge_0_2"
    snap = snapshot(spark, silver)
    assert snap.count() == 55
    assert (
        snap.where(F.col("doc_id").between(10, 19))
        .agg(F.min("qty"))
        .collect()[0][0]
        >= 10000
    )

    # upstream DELETE does not remove the silver key (latest-state)
    delete_rows_dv(spark, bronze, "doc_id", [3])
    drain_table_changes(spark, bronze, ckpt, sink)
    assert snapshot(spark, silver).where("doc_id = 3").count() == 1

    # crash-replay invariance: rewind the cursor and re-drain — the
    # watermark makes every replayed range a no-op
    cur = CdfCursor(ckpt)
    with open(cur._path, "w") as f:
        _json.dump({"version": -1}, f)
    before = sorted(map(tuple, snapshot(spark, silver).collect()))
    hist_before = len(history(silver))
    drain_table_changes(spark, bronze, ckpt, sink)
    assert sorted(map(tuple, snapshot(spark, silver).collect())) == before
    assert len(history(silver)) == hist_before
    assert resolve_txns(silver)["silver-up"] == current_version(bronze)
