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
