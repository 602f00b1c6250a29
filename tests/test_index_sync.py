"""The ANN index as a derived table of a txlog embeddings table.

`build_index_from_table` captures a snapshot + sync cursor;
`sync_index_from_table` drains the change feed and applies the net
effect exactly-once: appends land in their buckets, deletes/updates
rewrite only the buckets holding the affected ids. The invariant after
every sync: the index corpus (id, vector) EQUALS the table snapshot —
which makes a GDPR delete on the source table reach the vector index
through the same maintenance verb as every other derived table.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from etl_sentinel_imagery_spark.operators.txlog import (
    append,
    delete_rows_dv,
    init_table,
    merge_upsert,
    snapshot,
    update_rows,
)
from etl_sentinel_imagery_spark.plans.serving import (
    build_index_from_table,
    sync_index_from_table,
    topk,
)


def _vecs(spark, ids, shift=0.0):
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


def _corpus(spark, index_dir):
    from etl_sentinel_imagery_spark.operators.similarity import (
        read_indexed_layout,
    )

    # the COMMITTED view: retired generations stay on disk for
    # in-flight readers (vacuum_layout removes them), so the corpus
    # check must resolve the live manifest like every real reader
    return sorted(
        (r["vec_id"], tuple(round(x, 9) for x in r["embedding"]))
        for r in read_indexed_layout(
            spark, os.path.join(index_dir, "ivf")
        ).select("vec_id", "embedding").collect()
    )


def _table(spark, t):
    return sorted(
        (r["vec_id"], tuple(round(x, 9) for x in r["embedding"]))
        for r in snapshot(spark, t).collect()
    )


def test_sync_applies_appends_deletes_updates_exactly(
    spark, tmp_path
):
    t = str(tmp_path / "emb")
    init_table(spark, t, _vecs(spark, range(40)).coalesce(2))
    idx = str(tmp_path / "idx")
    build_index_from_table(spark, t, idx, n_centroids=4)
    assert _corpus(spark, idx) == _table(spark, t)

    append(spark, t, _vecs(spark, range(100, 110)).coalesce(1))
    delete_rows_dv(spark, t, "vec_id", [3, 5, 101])  # GDPR purge
    update_rows(
        spark,
        t,
        "vec_id = 7",
        {"embedding": F.expr("transform(embedding, x -> x + 0.5)")},
    )
    rep = sync_index_from_table(spark, t, idx)
    # 9 surviving appends + the updated id (101 appended-then-deleted
    # nets to a delete and never reaches the index)
    assert rep["upserts"] == 10
    assert rep["deletes"] == 3
    assert rep["buckets_rewritten"] >= 1
    assert _corpus(spark, idx) == _table(spark, t)
    # serving: deleted ids never surface; the updated vector serves
    # its NEW value (exact rerank reads the synced full-precision row)
    q = _vecs(spark, [7]).select(
        "vec_id",
        F.expr("transform(embedding, x -> x + 0.5)").alias("embedding"),
    )
    hits = topk(spark, q, idx, k=5, n_probe=4).collect()
    assert all(h["cand_id"] not in (3, 5, 101) for h in hits)

    # a second sync with no new commits is a no-op
    rep2 = sync_index_from_table(spark, t, idx)
    assert rep2["upserts"] == 0 and rep2["buckets_rewritten"] == 0
    assert _corpus(spark, idx) == _table(spark, t)


def test_sync_replay_after_crash_converges(spark, tmp_path):
    """Crash between apply and cursor advance: the redo sweeps the
    partial append (its ids are changed ids by construction) and the
    corpus still equals the snapshot — no duplicates."""
    t = str(tmp_path / "emb2")
    init_table(spark, t, _vecs(spark, range(20)).coalesce(1))
    idx = str(tmp_path / "idx2")
    build_index_from_table(spark, t, idx, n_centroids=3)
    cur = os.path.join(idx, "_table_sync.json")
    pre_crash = open(cur).read()

    merge_upsert(
        spark, t, _vecs(spark, [5, 6, 200], shift=0.25), "vec_id"
    )
    sync_index_from_table(spark, t, idx)
    assert _corpus(spark, idx) == _table(spark, t)
    # simulate the crash: cursor never advanced — the range replays
    with open(cur, "w") as f:
        f.write(pre_crash)
    rep = sync_index_from_table(spark, t, idx)
    assert rep["upserts"] == 3
    assert _corpus(spark, idx) == _table(spark, t)


def test_sync_clears_fully_emptied_buckets(spark, tmp_path):
    t = str(tmp_path / "emb3")
    init_table(spark, t, _vecs(spark, range(30)).coalesce(1))
    idx = str(tmp_path / "idx3")
    build_index_from_table(spark, t, idx, n_centroids=2)
    # kill everything: both buckets empty out
    delete_rows_dv(
        spark, t, "vec_id", list(range(30))
    )
    rep = sync_index_from_table(spark, t, idx)
    assert rep["deletes"] == 30
    assert _corpus(spark, idx) == [] == _table(spark, t)


def test_sync_refuses_pq_tier_only(spark, tmp_path):
    """HNSW is now maintained (round-6 verdict #3); the PQ tier —
    still a rebuild-cadence artifact — keeps its honest refusal."""
    t = str(tmp_path / "emb4")
    init_table(spark, t, _vecs(spark, range(10)).coalesce(1))
    idx = str(tmp_path / "idx4")
    with pytest.raises(ValueError, match="PQ tier"):
        build_index_from_table(spark, t, idx, pq=True)
    build_index_from_table(spark, t, idx, n_centroids=2, hnsw=False)
    os.makedirs(os.path.join(idx, "ivfpq"))
    append(spark, t, _vecs(spark, [99]).coalesce(1))
    with pytest.raises(ValueError, match="PQ tier"):
        sync_index_from_table(spark, t, idx)
    # and a missing cursor directs to the build verb
    idx2 = str(tmp_path / "idx5")
    os.makedirs(idx2)
    with pytest.raises(ValueError, match="build_index_from_table"):
        sync_index_from_table(spark, t, idx2)


def test_sync_maintains_hnsw_tier_end_to_end(spark, tmp_path):
    """The tier matrix extends to HNSW (round-6 verdict #3): a GDPR
    purge reaches the GRAPH-SERVED top-k, updates serve their new
    vectors, crash replay converges, and accumulated churn past the
    rebuild-debt threshold triggers a full rebuild."""
    t = str(tmp_path / "embh")
    init_table(spark, t, _vecs(spark, range(60)).coalesce(2))
    idx = str(tmp_path / "idxh")
    build_index_from_table(
        spark, t, idx, n_centroids=4, hnsw=True, hnsw_shards=2
    )

    append(spark, t, _vecs(spark, range(200, 210)).coalesce(1))
    delete_rows_dv(spark, t, "vec_id", [3, 5, 203])
    update_rows(
        spark,
        t,
        "vec_id = 7",
        {"embedding": F.expr("transform(embedding, x -> x + 0.5)")},
    )
    rep = sync_index_from_table(spark, t, idx, hnsw_rebuild_debt=0.5)
    assert rep["hnsw"]["action"] == "repair"
    assert _corpus(spark, idx) == _table(spark, t)
    # graph nodes == table ids exactly (no stale nodes, no misses)
    from etl_sentinel_imagery_spark.operators.similarity import (
        read_indexed_layout,
    )

    nodes = {
        r["node_id"]
        for r in read_indexed_layout(spark, os.path.join(idx, "hnsw"))
        .filter(F.col("level") == 0)
        .collect()
    }
    assert nodes == {i for i, _ in _table(spark, t)}
    # purge reaches the GRAPH-served top-k
    q = _vecs(spark, [7]).select(
        "vec_id",
        F.expr("transform(embedding, x -> x + 0.5)").alias("embedding"),
    )
    hits = topk(spark, q, idx, k=8, tier="hnsw", ef_search=64).collect()
    assert hits, "graph tier serves"
    assert all(h["cand_id"] not in (3, 5, 203) for h in hits)

    # crash replay converges (cursor rollback)
    cur = os.path.join(idx, "_table_sync.json")
    pre = open(cur).read()
    merge_upsert(spark, t, _vecs(spark, [9, 300], shift=0.2), "vec_id")
    sync_index_from_table(spark, t, idx, hnsw_rebuild_debt=0.5)
    with open(cur, "w") as f:
        f.write(pre)
    sync_index_from_table(spark, t, idx, hnsw_rebuild_debt=0.5)
    assert _corpus(spark, idx) == _table(spark, t)
    nodes2 = {
        r["node_id"]
        for r in read_indexed_layout(spark, os.path.join(idx, "hnsw"))
        .filter(F.col("level") == 0)
        .collect()
    }
    assert nodes2 == {i for i, _ in _table(spark, t)}

    # rebuild debt: a churn burst past the threshold rebuilds
    delete_rows_dv(spark, t, "vec_id", list(range(20, 50)))
    rep3 = sync_index_from_table(spark, t, idx, hnsw_rebuild_debt=0.2)
    assert rep3["hnsw"]["action"] == "rebuild"
    import json as _json

    meta = _json.load(open(os.path.join(idx, "hnsw_meta.json")))
    assert meta["churn"] == 0
    assert _corpus(spark, idx) == _table(spark, t)
    hits3 = topk(
        spark, _vecs(spark, [1]), idx, k=5, tier="hnsw", ef_search=64
    ).collect()
    assert hits3 and all(
        20 > h["cand_id"] or h["cand_id"] >= 50 or h["cand_id"] > 199
        for h in hits3
    )
