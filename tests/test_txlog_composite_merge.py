"""Composite MERGE ON keys (round-8 verdict #1): txlog.merge accepts
a LIST of key columns — the conjunctive equi-key MERGE every
multi-column natural key needs (lineitem's (orderkey, linenumber)).
Matching is on the key tuple, source uniqueness is tuple-uniqueness,
probe pruning runs on the leading key, and the result equals the old
guidance's surrogate-key workaround row for row."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_sentinel_imagery_spark.operators.txlog import (
    init_table,
    merge,
    snapshot,
    table_changes,
)


def test_composite_key_merge_tuple_semantics(spark, tmp_path):
    """Matching is on the key TUPLE — rows sharing the leading key but
    differing on the second never match; a leading-key duplicate in
    the source is legal (tuple-unique); clauses and the change feed
    work unchanged; NULL/missing keys refuse loudly."""
    t = str(tmp_path / "comp")
    init_table(
        spark,
        t,
        spark.createDataFrame(
            [(1, 1, 10), (1, 2, 20), (2, 1, 30), (3, 1, 40)],
            ["orderkey", "linenumber", "qty"],
        ).coalesce(1),
        stat_cols=["orderkey"],
    )
    src = spark.createDataFrame(
        [(1, 2, 200), (1, 3, 300), (2, 1, -1), (4, 1, 400)],
        ["orderkey", "linenumber", "qty"],
    )
    v = merge(
        spark,
        t,
        src,
        ["orderkey", "linenumber"],
        when_matched=[
            ("delete", "s.qty < 0"),
            ("update", None, {"qty": "s.qty"}),
        ],
        when_not_matched=[("insert", None)],
    )
    got = sorted(map(tuple, snapshot(spark, t).collect()))
    assert got == [
        (1, 1, 10),   # same orderkey, different linenumber: no match
        (1, 2, 200),  # tuple match: updated
        (1, 3, 300),  # leading-key dup in source, new tuple: insert
        (3, 1, 40),   # untouched
        (4, 1, 400),  # insert
    ]  # (2, 1) deleted by the conditioned clause
    # change feed carries the standard delete+insert pairs
    ch = table_changes(spark, t, 0, v)
    kinds = sorted(
        (r["orderkey"], r["linenumber"], r["_change_type"])
        for r in ch.collect()
    )
    assert (2, 1, "delete") in kinds and (1, 2, "insert") in kinds

    # tuple-duplicate source refuses; leading-dup alone is fine (above)
    dup = spark.createDataFrame(
        [(7, 7, 1), (7, 7, 2)], ["orderkey", "linenumber", "qty"]
    )
    with pytest.raises(ValueError, match="not key-unique"):
        merge(spark, t, dup, ["orderkey", "linenumber"])
    # missing key column refuses before any work
    with pytest.raises(ValueError, match="lacks key columns"):
        merge(
            spark,
            t,
            src.drop("linenumber"),
            ["orderkey", "linenumber"],
        )
    # NULL keys refuse: they can never match an equi-join
    with pytest.raises(ValueError, match="not key-unique"):
        merge(
            spark,
            t,
            spark.createDataFrame(
                [(9, None, 1)],
                "orderkey int, linenumber int, qty int",
            ),
            ["orderkey", "linenumber"],
        )


def test_composite_key_merge_equals_surrogate_twin(spark, tmp_path):
    """The composite form must equal the OLD guidance's workaround (a
    pre-concatenated surrogate key) row for row — including the
    by-source leg and clause conditions over both namespaces."""
    rows = [(i // 3, i % 3, i * 10, "old") for i in range(12)]
    src_rows = [
        (i // 3, i % 3, i * 100, "src") for i in range(6, 18)
    ]
    a, b = str(tmp_path / "nat"), str(tmp_path / "sur")
    init_table(
        spark,
        a,
        spark.createDataFrame(
            rows, ["k1", "k2", "v", "tag"]
        ).coalesce(2),
    )
    init_table(
        spark,
        b,
        spark.createDataFrame(rows, ["k1", "k2", "v", "tag"])
        .withColumn("sk", F.concat_ws(" ", "k1", "k2"))
        .coalesce(2),
    )
    src = spark.createDataFrame(src_rows, ["k1", "k2", "v", "tag"])
    clauses = dict(
        when_matched=[
            ("delete", "s.v >= 1500"),
            ("update", "t.v < s.v", {"v": "s.v", "tag": "s.tag"}),
        ],
        when_not_matched=[("insert", "s.v < 1700")],
        when_not_matched_by_source=[
            ("update", "t.v < 20", {"tag": "'stale'"})
        ],
    )
    merge(spark, a, src, ["k1", "k2"], **clauses)
    merge(
        spark,
        b,
        src.withColumn("sk", F.concat_ws(" ", "k1", "k2")),
        "sk",
        **clauses,
    )
    got_a = sorted(
        map(
            tuple,
            snapshot(spark, a).select("k1", "k2", "v", "tag").collect(),
        )
    )
    got_b = sorted(
        map(
            tuple,
            snapshot(spark, b).select("k1", "k2", "v", "tag").collect(),
        )
    )
    assert got_a == got_b and got_a


def test_merge_upsert_composite_keys(spark, tmp_path):
    """The FAST upsert path takes the same composite-key contract as
    the clause merge: tuple matching, tuple uniqueness, and the two
    forms agree row for row."""
    from etl_sentinel_imagery_spark.operators.txlog import merge_upsert

    rows = [(i // 3, i % 3, i * 10) for i in range(12)]
    src_rows = [(i // 3, i % 3, i * 100) for i in range(6, 18)]
    a, b = str(tmp_path / "fu"), str(tmp_path / "fc")
    for d in (a, b):
        init_table(
            spark,
            d,
            spark.createDataFrame(rows, ["k1", "k2", "v"]).coalesce(2),
        )
    src = spark.createDataFrame(src_rows, ["k1", "k2", "v"])
    merge_upsert(spark, a, src, ["k1", "k2"])
    merge(spark, b, src, ["k1", "k2"])  # default clauses == upsert
    rows_a = sorted(map(tuple, snapshot(spark, a).collect()))
    rows_b = sorted(map(tuple, snapshot(spark, b).collect()))
    assert rows_a == rows_b
    # tuple semantics: (0,0) only in target, survives; (5,2) updated
    assert (0, 0, 0) in rows_a and (5, 2, 1700) in rows_a
    assert len(rows_a) == 18

    with pytest.raises(ValueError, match="not key-unique"):
        merge_upsert(
            spark,
            a,
            spark.createDataFrame(
                [(1, 1, 5), (1, 1, 6)], ["k1", "k2", "v"]
            ),
            ["k1", "k2"],
        )
    with pytest.raises(ValueError, match="lacks key columns"):
        merge_upsert(spark, a, src.drop("k2"), ["k1", "k2"])


def test_composite_merge_prunes_on_trailing_key_stats(
    spark, tmp_path, monkeypatch
):
    """Round-9 extension: when trailing composite-key columns are
    stats-tracked, the probe intersects their [min, max] ranges too —
    a source touching only one file's k2 range probes ONE file even
    though every file overlaps on the leading key."""
    from etl_sentinel_imagery_spark.operators import txlog as tx

    d = str(tmp_path / "pr")
    init_table(
        spark,
        d,
        spark.createDataFrame(
            [(i, j, i * j) for i in range(10) for j in range(5)],
            ["k1", "k2", "v"],
        ).coalesce(1),
        stat_cols=["k1", "k2"],
    )
    # second file: same k1 range, disjoint k2 range
    tx.append(
        spark,
        d,
        spark.createDataFrame(
            [(i, j, -1) for i in range(10) for j in range(100, 105)],
            ["k1", "k2", "v"],
        ).coalesce(1),
    )
    probed = []
    orig = tx._read_entries

    def spy(spark_, table_dir, entries, version, **kw):
        if kw.get("keep_pos"):
            probed.append(len(entries))
        return orig(spark_, table_dir, entries, version, **kw)

    monkeypatch.setattr(tx, "_read_entries", spy)
    src = spark.createDataFrame(
        [(3, 100, 777), (3, 101, 888)], ["k1", "k2", "v"]
    )
    merge(spark, d, src, ["k1", "k2"])
    monkeypatch.undo()
    # leading-key stats [0,9] overlap BOTH files; the trailing-key
    # intersect keeps only the k2-in-[100,104] file
    assert probed and max(probed) == 1, probed
    got = sorted(
        tuple(r)
        for r in snapshot(spark, d)
        .filter("k1 = 3 AND k2 IN (100, 101)")
        .collect()
    )
    assert got == [(3, 100, 777), (3, 101, 888)]


def test_apply_changes_composite_key_replication(spark, tmp_path):
    """APPLY CHANGES with a composite key: a downstream replica keyed
    on (k1, k2) consumes the upstream's CDF slice and lands
    row-identical — netting, probing, and the DV semi-join all key on
    the tuple (rows sharing only k1 must not collide)."""
    from etl_sentinel_imagery_spark.operators.txlog import (
        apply_changes,
        current_version,
        delete_where,
        merge_upsert,
    )

    rows = [(i // 3, i % 3, i * 10) for i in range(12)]
    up, down = str(tmp_path / "up"), str(tmp_path / "down")
    for d in (up, down):
        init_table(
            spark,
            d,
            spark.createDataFrame(rows, ["k1", "k2", "v"]).coalesce(2),
        )
    v0 = current_version(up)
    merge_upsert(
        spark,
        up,
        spark.createDataFrame(
            [(1, 1, 999), (7, 0, 700)], ["k1", "k2", "v"]
        ),
        ["k1", "k2"],
    )
    delete_where(spark, up, "k1 = 2 AND k2 = 2")
    v1 = current_version(up)

    apply_changes(
        spark,
        down,
        table_changes(spark, up, v0, v1),
        ["k1", "k2"],
    )
    a = sorted(map(tuple, snapshot(spark, up).collect()))
    b = sorted(map(tuple, snapshot(spark, down).collect()))
    assert a == b
    assert (1, 1, 999) in b and (7, 0, 700) in b
    assert (1, 0, 30) in b  # k1=1 sibling untouched by the (1,1) update
    assert not any(r[:2] == (2, 2) for r in b)
