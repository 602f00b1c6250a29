"""Full MERGE clause grammar (txlog.merge): ordered WHEN MATCHED
clauses (update_all / update-subset / delete, each optionally
conditioned over t.*/s.*) + conditional WHEN NOT MATCHED insert —
one merge-on-read commit, first-hit-wins clause order, untouched
matched rows preserved, exact against hand-computed expectations."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_sentinel_imagery_spark.operators.txlog import (
    ConstraintViolation,
    add_constraint,
    current_version,
    init_table,
    merge,
    merge_upsert,
    snapshot,
    table_changes,
)


def _target(spark):
    # doc_id, qty, status
    return spark.createDataFrame(
        [(i, i * 10, "old") for i in range(8)],
        ["doc_id", "qty", "status"],
    )


def _source(spark):
    # keys 4..11: 4..7 matched, 8..11 new; tombstone on 5 and 9
    return spark.createDataFrame(
        [
            (i, i * 100, "src", i in (5, 9))
            for i in range(4, 12)
        ],
        ["doc_id", "qty", "status", "tomb"],
    )


def test_default_clauses_equal_merge_upsert(spark, tmp_path):
    t1, t2 = str(tmp_path / "a"), str(tmp_path / "b")
    src = spark.createDataFrame(
        [(5, 500, "s"), (20, 2000, "s")], ["doc_id", "qty", "status"]
    )
    for t in (t1, t2):
        init_table(spark, t, _target(spark).coalesce(1))
    merge_upsert(spark, t1, src, "doc_id")
    merge(spark, t2, src, "doc_id")
    a = sorted(map(tuple, snapshot(spark, t1).collect()))
    b = sorted(map(tuple, snapshot(spark, t2).collect()))
    assert a == b and len(a) == 9


def test_clause_grammar_end_to_end(spark, tmp_path):
    """Tombstoned matches DELETE; other matches accumulate qty
    (t.qty + s.qty) keeping their status; tombstoned non-matches are
    dropped by the insert condition; untouched rows stay byte-equal;
    everything in ONE commit."""
    t = str(tmp_path / "g")
    init_table(spark, t, _target(spark).repartition(2))
    v0 = current_version(t)
    v = merge(
        spark,
        t,
        _source(spark),
        "doc_id",
        when_matched=[
            ("delete", "s.tomb"),
            ("update", None, {"qty": "t.qty + s.qty", "status": F.lit("acc")}),
        ],
        when_not_matched=[("insert", "NOT s.tomb")],
    )
    assert v == v0 + 1  # one commit
    snap = snapshot(spark, t)
    got = {
        r["doc_id"]: (r["qty"], r["status"], r["tomb"])
        for r in snap.collect()
    }
    want = {}
    for i in range(8):
        if i == 5:
            continue  # tombstone delete
        if i in (4, 6, 7):  # accumulated updates keep target status col
            want[i] = (i * 10 + i * 100, "acc", None)
        else:  # untouched (0..3): tomb NULL-fills under evolved schema
            want[i] = (i * 10, "old", None)
    for i in (8, 10, 11):  # inserted non-tombstones
        want[i] = (i * 100, "src", False)
    assert got == want
    # the feed shows delete+insert pairs in one version
    feed = table_changes(spark, t, v0, v)
    assert feed.select("_commit_version").distinct().count() == 1
    assert feed.where("_change_type = 'delete'").count() == 4  # 4,5,6,7
    assert feed.where("_change_type = 'insert'").count() == 6  # 3 upd + 3 ins


def test_clause_order_first_hit_wins(spark, tmp_path):
    t = str(tmp_path / "o")
    init_table(spark, t, _target(spark).coalesce(1))
    merge(
        spark,
        t,
        _source(spark),
        "doc_id",
        when_matched=[
            ("update", "s.doc_id = 5", {"status": F.lit("first")}),
            ("delete", "s.tomb"),  # would also hit 5 — must not
        ],
        when_not_matched=[],
    )
    snap = snapshot(spark, t)
    assert snap.where("doc_id = 5").collect()[0]["status"] == "first"
    assert snap.count() == 8  # match-only merge: no inserts


def test_match_only_and_no_clause_rows_untouched(spark, tmp_path):
    t = str(tmp_path / "u")
    init_table(spark, t, _target(spark).coalesce(1))
    before = sorted(map(tuple, snapshot(spark, t).collect()))
    v0 = current_version(t)
    # a conditioned update nobody satisfies + no inserts: no commit
    v = merge(
        spark,
        t,
        _source(spark),
        "doc_id",
        when_matched=[("update", "s.qty < 0", {"status": F.lit("x")})],
        when_not_matched=[],
    )
    assert v == v0
    assert sorted(map(tuple, snapshot(spark, t).collect())) == before


def test_merge_images_respect_constraints_and_validation(
    spark, tmp_path
):
    t = str(tmp_path / "c")
    init_table(spark, t, _target(spark).coalesce(1))
    add_constraint(spark, t, "qty_pos", "qty >= 0")
    with pytest.raises(ConstraintViolation, match="qty_pos"):
        merge(
            spark,
            t,
            _source(spark),
            "doc_id",
            when_matched=[("update", None, {"qty": F.lit(-1)})],
            when_not_matched=[],
        )
    assert snapshot(spark, t).count() == 8  # nothing committed
    with pytest.raises(ValueError, match="unknown matched clause"):
        merge(spark, t, _source(spark), "doc_id",
              when_matched=[("upsert", None)])
    with pytest.raises(ValueError, match="not key-unique"):
        merge(
            spark,
            t,
            _source(spark).unionAll(_source(spark)),
            "doc_id",
        )
    with pytest.raises(ValueError, match="unknown columns"):
        merge(
            spark, t, _source(spark), "doc_id",
            when_matched=[("update", None, {"nope": F.lit(1)})],
            when_not_matched=[],
        )


def test_merge_insert_schema_evolution_stance(spark, tmp_path):
    """Round-8 verdict #6, pinned: a NOT-MATCHED whole-row INSERT (and
    update_all) whose source carries columns the target lacks EVOLVES
    the schema by name, exactly like append — pre-existing rows serve
    the new column NULL; a COLUMN-LIST insert naming a column the
    target lacks refuses loudly (it binds existing columns only, never
    evolves). One test per path; the stance is documented in
    txlog.merge's docstring."""
    t1 = str(tmp_path / "evo")
    init_table(spark, t1, _target(spark).coalesce(1))
    wide_src = spark.createDataFrame(
        [(6, 600, "s", "eu"), (20, 2000, "s", "us")],
        ["doc_id", "qty", "status", "region"],
    )
    merge(spark, t1, wide_src, "doc_id")  # update_all + insert *
    snap = snapshot(spark, t1)
    assert "region" in snap.columns
    got = {
        r["doc_id"]: (r["qty"], r["region"]) for r in snap.collect()
    }
    assert got[20] == (2000, "us")   # whole-row insert carried it
    assert got[6] == (600, "eu")     # update_all carried it
    assert got[0] == (0, None)       # untouched rows: NULL-filled

    # column-list insert: unknown target column refuses, no evolution
    t2 = str(tmp_path / "noevo")
    init_table(spark, t2, _target(spark).coalesce(1))
    with pytest.raises(ValueError, match="unknown columns"):
        merge(
            spark,
            t2,
            wide_src,
            "doc_id",
            when_matched=[("delete", "false")],
            when_not_matched=[
                ("insert", None, {"doc_id": "s.doc_id",
                                  "region": "s.region"})
            ],
        )
    assert "region" not in snapshot(spark, t2).columns
