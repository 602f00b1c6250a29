"""DV anti-join strategy: broadcast when the manifest proves it small.

Round 12: the deletion-vector anti-join in _read_entries planned as
SortMergeJoin (the whole table shuffled on (_file_name, _row_pos) to
drop a few dead positions). Each manifest entry records its cumulative
dead-row count (dv_n), so the read path now broadcasts the DV side
when the summed bound is under SPARK_GRAFT_DV_BROADCAST_MAX — and
keeps the spilling sort-merge above it. Both the plan shape and the
row results are pinned here.
"""

from __future__ import annotations

import io
import os
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

from etl_sentinel_imagery_spark.operators.txlog import (
    delete_rows_dv,
    init_table,
    snapshot,
)


@pytest.fixture(scope="module")
def dv_table(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("dvb") / "t")
    df = spark.range(0, 10_000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("v")
    )
    init_table(spark, d, df)
    # DV-delete a slice (merge-on-read: no rewrite)
    delete_rows_dv(
        spark, d, "k", [i for i in range(0, 10_000, 17)]
    )
    return d


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_small_dv_anti_join_broadcasts(spark, dv_table):
    plan = _plan(snapshot(spark, dv_table))
    assert "BroadcastHashJoin LeftAnti" in plan, plan
    assert "SortMergeJoin LeftAnti" not in plan, plan


def test_byte_cap_boundary(spark, dv_table):
    """Round 13: the cap is denominated in estimated bytes
    (positions × _DV_BCAST_ROW_BYTES). At exactly the estimate the
    broadcast fires; one byte under it falls back to sort-merge —
    rows identical either way."""
    from etl_sentinel_imagery_spark.operators.txlog import (
        _DV_BCAST_ROW_BYTES,
    )

    n_dv = len([i for i in range(0, 10_000, 17)])
    est = n_dv * _DV_BCAST_ROW_BYTES
    expected = {(i, i * 3) for i in range(10_000) if i % 17 != 0}
    try:
        os.environ["SPARK_GRAFT_DV_BROADCAST_MAX_BYTES"] = str(est)
        plan = _plan(snapshot(spark, dv_table))
        assert "BroadcastHashJoin LeftAnti" in plan, plan
        os.environ["SPARK_GRAFT_DV_BROADCAST_MAX_BYTES"] = str(est - 1)
        plan = _plan(snapshot(spark, dv_table))
        assert "SortMergeJoin LeftAnti" in plan, plan
        got = {
            (r["k"], r["v"])
            for r in snapshot(spark, dv_table).collect()
        }
    finally:
        del os.environ["SPARK_GRAFT_DV_BROADCAST_MAX_BYTES"]
    assert got == expected


def test_rows_identical_under_both_strategies(spark, dv_table):
    expected = {
        (i, i * 3) for i in range(10_000) if i % 17 != 0
    }
    got = {
        (r["k"], r["v"]) for r in snapshot(spark, dv_table).collect()
    }
    assert got == expected
    # force the sort-merge path via a zero cap: same rows
    os.environ["SPARK_GRAFT_DV_BROADCAST_MAX"] = "0"
    try:
        plan = _plan(snapshot(spark, dv_table))
        assert "SortMergeJoin LeftAnti" in plan, plan
        got2 = {
            (r["k"], r["v"])
            for r in snapshot(spark, dv_table).collect()
        }
    finally:
        del os.environ["SPARK_GRAFT_DV_BROADCAST_MAX"]
    assert got2 == expected
