"""One-pass change-feed diff: multiset equivalence + exchange reuse.

Round 12: ``table_changes`` computed per-commit inserts/deletes as
``a.exceptAll(r)`` / ``r.exceptAll(a)`` — two aggregation subtrees
whose +1/−1 tags swap sides, so they can never share an exchange and
each side's files scan twice per commit. ``_diff_both`` tags once,
aggregates the signed count once, and derives BOTH directions from the
same net column: identical multisets (pinned here against exceptAll on
duplicate- and null-bearing frames), and the two branches canonicalize
identically so exchange reuse applies (pinned on an AQE-off session —
AQE performs the same reuse at runtime through its stage cache).
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from etl_sentinel_imagery_spark.operators.txlog import _diff_both


def _counter(df):
    return Counter(tuple(r) for r in df.collect())


def _frames(spark):
    # duplicates on both sides, rows unique to each side, and NULLs
    # (grouping treats NULLs as equal — same as exceptAll's comparison)
    a = spark.createDataFrame(
        [(1, "x"), (1, "x"), (1, "x"), (2, "y"), (None, "n"), (4, None)],
        "k int, s string",
    )
    r = spark.createDataFrame(
        [(1, "x"), (2, "y"), (2, "y"), (3, "z"), (None, "n"), (None, "n")],
        "k int, s string",
    )
    return a, r


def test_diff_both_matches_exceptall_pair(spark):
    a, r = _frames(spark)
    ins, dels = _diff_both(a, r)
    assert _counter(ins) == _counter(a.exceptAll(r))
    assert _counter(dels) == _counter(r.exceptAll(a))
    # and the specific expected multisets, so the oracle is not just
    # self-referential
    assert _counter(ins) == Counter({(1, "x"): 2, (4, None): 1})
    assert _counter(dels) == Counter(
        {(2, "y"): 1, (3, "z"): 1, (None, "n"): 1}
    )


def test_diff_both_none_passthrough(spark):
    a, _ = _frames(spark)
    ins, dels = _diff_both(a, None)
    assert ins is a and dels is None
    ins, dels = _diff_both(None, a)
    assert ins is None and dels is a


def test_diff_both_branches_share_one_exchange(spark):
    # The reuse property needs static planning to be visible; AQE
    # defers reuse to its runtime stage cache (same canonicalization),
    # so flip AQE off for the planning assertion and restore it.
    prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        a = spark.range(1000).select((F.col("id") % 13).alias("k"))
        r = spark.range(500).select((F.col("id") % 7).alias("k"))
        ins, dels = _diff_both(a, r)
        plan = (
            ins.unionByName(dels)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "ReusedExchange" in plan, plan
        # the exceptAll pair, by contrast, cannot reuse
        pair = (
            a.exceptAll(r)
            .unionByName(r.exceptAll(a))
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "ReusedExchange" not in pair, pair
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)
