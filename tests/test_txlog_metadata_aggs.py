"""Metadata-only aggregates: exact COUNT(*) and min/max bounds served
from manifests alone — no SparkSession in the signature, so at 100 TB
the answer is a few-KB manifest read, not a cluster pass. The tests
drive every write verb and compare against the real snapshot."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from etl_sentinel_imagery_spark.operators.txlog import (
    append,
    compact,
    delete_rows,
    delete_rows_dv,
    delete_where,
    init_table,
    merge_upsert,
    metadata_count,
    metadata_minmax,
    snapshot,
    table_details,
    update_rows,
)


def _seed(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"),
        (F.col("id") * 2).alias("v"),
        (F.col("id") % 3).cast("int").alias("grp"),
    )


def test_count_is_exact_across_every_write_verb(spark, tmp_path):
    d = str(tmp_path / "t")
    init_table(spark, d, _seed(spark, 0, 40).coalesce(2), stat_cols=["k"])

    def check():
        assert metadata_count(d) == snapshot(spark, d).count()

    check()
    append(spark, d, _seed(spark, 40, 60).coalesce(1))
    check()
    delete_rows_dv(spark, d, "k", [3, 7, 45])
    check()
    delete_where(spark, d, "grp = 2 AND k >= 50")
    check()
    update_rows(spark, d, "k < 5", {"v": "v + 1000"})  # count-neutral
    check()
    merge_upsert(
        spark,
        d,
        spark.range(55, 70).select(
            F.col("id").alias("k"),
            (F.col("id") * 9).alias("v"),
            F.lit(0).cast("int").alias("grp"),
        ),
        "k",
    )
    check()
    compact(spark, d)
    check()
    delete_rows(spark, d, "k", [0, 1])  # copy-on-write sibling
    check()
    # time travel: counts answer per-version
    assert metadata_count(d, 0) == 40
    assert table_details(d)["live_rows"] == metadata_count(d)


def test_minmax_stats_column_exactness_lifecycle(spark, tmp_path):
    d = str(tmp_path / "t")
    init_table(spark, d, _seed(spark, 10, 50).coalesce(2), stat_cols=["k"])
    mm = metadata_minmax(d, "k")
    assert mm == {"min": 10, "max": 49, "exact": True, "covered": True}
    # a DV delete demotes to valid-but-inexact bounds (the extreme row
    # might have been the deleted one)
    delete_rows_dv(spark, d, "k", [49])
    mm = metadata_minmax(d, "k")
    assert mm["exact"] is False and mm["covered"] is True
    real = snapshot(spark, d).agg(
        F.min("k").alias("lo"), F.max("k").alias("hi")
    ).collect()[0]
    assert mm["min"] <= real["lo"] and mm["max"] >= real["hi"]
    # materializing the DVs (compact rewrites + re-records stats)
    # restores exactness — and the bound tightens to the live max
    compact(spark, d)
    mm = metadata_minmax(d, "k")
    assert mm == {"min": 10, "max": 48, "exact": True, "covered": True}


def test_minmax_partition_column_is_exact_under_dv(spark, tmp_path):
    d = str(tmp_path / "t")
    init_table(
        spark,
        d,
        _seed(spark, 0, 30).coalesce(1),
        partition_cols=["grp"],
    )
    assert metadata_minmax(d, "grp") == {
        "min": 0,
        "max": 2,
        "exact": True,
        "covered": True,
    }
    # partially delete inside grp=2: still present, still exact
    delete_rows_dv(spark, d, "k", [2, 5])
    assert metadata_minmax(d, "grp")["max"] == 2
    assert metadata_minmax(d, "grp")["exact"] is True
    # delete ALL of grp=2: its files leave the manifest, bound shrinks
    delete_where(spark, d, "grp = 2")
    assert metadata_minmax(d, "grp") == {
        "min": 0,
        "max": 1,
        "exact": True,
        "covered": True,
    }


def test_minmax_refuses_untracked_and_flags_uncovered(spark, tmp_path):
    d = str(tmp_path / "t")
    init_table(spark, d, _seed(spark, 0, 10).coalesce(1), stat_cols=["k"])
    with pytest.raises(ValueError, match="stat_cols"):
        metadata_minmax(d, "v")
    # back-compat: an entry with NO recorded stats (pre-stats file)
    # must flag covered=False — its rows may lie outside the bounds
    append(spark, d, _seed(spark, 10, 20).coalesce(1))
    mpath = os.path.join(d, "_txlog", "v_00000001.json")
    m = json.load(open(mpath))
    for e in m["adds"]:
        e.pop("stats", None)
    json.dump(m, open(mpath, "w"))
    mm = metadata_minmax(d, "k")
    assert mm["covered"] is False and mm["exact"] is False
    assert mm["min"] == 0 and mm["max"] == 9  # covered files only


def test_empty_table(spark, tmp_path):
    d = str(tmp_path / "t")
    init_table(
        spark,
        d,
        _seed(spark, 0, 0).coalesce(1),
        stat_cols=["k"],
    )
    assert metadata_count(d) == 0
    mm = metadata_minmax(d, "k")
    assert mm["min"] is None and mm["max"] is None
