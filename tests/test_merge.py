"""MERGE upsert + SCD2 dimension maintenance."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_sentinel_imagery_spark.operators.merge import (
    merge_upsert,
    scd2_apply,
    scd2_as_of,
    scd2_init,
)


def test_merge_upsert_updates_and_inserts(spark):
    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "id int, name string, v double"
    )
    source = spark.createDataFrame(
        [(2, "B", 99.0), (4, "d", 40.0)], "id int, name string, v double"
    )
    out = {r["id"]: (r["name"], r["v"]) for r in merge_upsert(target, source, ["id"]).collect()}
    assert out == {1: ("a", 10.0), 2: ("B", 99.0), 3: ("c", 30.0), 4: ("d", 40.0)}


def test_merge_upsert_rejects_duplicate_source_keys(spark):
    target = spark.createDataFrame([(1, "a")], "id int, name string")
    dup = spark.createDataFrame([(1, "x"), (1, "y")], "id int, name string")
    with pytest.raises(ValueError, match="duplicate merge keys"):
        merge_upsert(target, dup, ["id"])


def test_scd2_lifecycle_and_as_of(spark):
    snap = spark.createDataFrame(
        [(1, "alice", "paris"), (2, "bob", "rome")], "id int, name string, city string"
    )
    dim = scd2_init(snap, "2024-01-01 00:00:00")

    # batch 1: alice moves; bob unchanged (no-op); carol appears
    updates = spark.createDataFrame(
        [(1, "alice", "lyon"), (2, "bob", "rome"), (3, "carol", "oslo")],
        "id int, name string, city string",
    )
    dim2 = scd2_apply(dim, updates, ["id"], "2024-06-01 00:00:00")
    rows = {(r["id"], r["city"], r["is_current"]) for r in dim2.collect()}
    assert rows == {
        (1, "paris", False),  # closed
        (1, "lyon", True),    # new version
        (2, "rome", True),    # untouched (no-op update)
        (3, "oslo", True),    # insert
    }
    closed = [r for r in dim2.collect() if r["id"] == 1 and not r["is_current"]][0]
    assert str(closed["valid_to"]).startswith("2024-06-01")

    # idempotent: reapplying the same batch changes nothing
    dim3 = scd2_apply(dim2, updates, ["id"], "2024-07-01 00:00:00")
    assert dim3.count() == dim2.count()

    # point-in-time views
    before = {(r["id"], r["city"]) for r in scd2_as_of(dim2, "2024-03-01").collect()}
    assert before == {(1, "paris"), (2, "rome")}
    after = {(r["id"], r["city"]) for r in scd2_as_of(dim2, "2024-08-01").collect()}
    assert after == {(1, "lyon"), (2, "rome"), (3, "oslo")}


def test_merge_matches_sql_semantics_on_tpch(spark):
    """merge_upsert over real tables equals the FULL-OUTER-JOIN
    formulation of MERGE (cross-checked Spark-vs-Spark)."""
    from etl_sentinel_imagery_spark.sources.tables import load_table

    SF_DIR = "/root/testdata/sf0.001"
    nation = load_table(spark, SF_DIR, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    source = nation.filter(F.col("n_nationkey") < 5).withColumn(
        "n_name", F.concat(F.col("n_name"), F.lit("_V2"))
    ).unionByName(
        spark.createDataFrame([(99, "ATLANTIS_V2", 0)], nation.schema)
    )
    merged = merge_upsert(nation, source, ["n_nationkey"])
    expect = (
        nation.alias("t")
        .join(source.alias("s"), "n_nationkey", "full_outer")
        .select(
            "n_nationkey",
            F.coalesce(F.col("s.n_name"), F.col("t.n_name")).alias("n_name"),
            F.coalesce(F.col("s.n_regionkey"), F.col("t.n_regionkey")).alias(
                "n_regionkey"
            ),
        )
    )
    assert {tuple(r) for r in merged.collect()} == {
        tuple(r) for r in expect.collect()
    }
    assert merged.count() == 26  # 25 nations + 1 insert
