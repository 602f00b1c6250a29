"""HLL sketch operator: merge exactness (the property pre-aggregation
relies on), estimate accuracy vs exact distinct, and the rollup shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_sentinel_imagery_spark.operators.sketches import (
    HLL_M,
    exact_error_bound,
    hll_estimate,
    hll_merge_agg,
    hll_sketch,
)
from etl_sentinel_imagery_spark.sources.tables import load_table
from tests.conftest import SF_DIR


def _est(spark, df, group_cols, key):
    sk = hll_sketch(df, group_cols, key)
    return sk, {
        tuple(r[c] for c in group_cols): r["est"]
        for r in sk.select(*group_cols, hll_estimate("hll").alias("est")).collect()
    }


def test_estimate_within_error_bound(spark):
    events = load_table(spark, SF_DIR, "events")
    exact = events.select("user_id").distinct().count()
    _, ests = _est(spark, events.withColumn("g", F.lit(1)), ["g"], "user_id")
    est = ests[(1,)]
    assert abs(est - exact) / exact < exact_error_bound(exact)


def test_merge_equals_whole_corpus_sketch_exactly(spark):
    """sketch(A ∪ B) must equal merge(sketch(A), sketch(B)) REGISTER FOR
    REGISTER — determinism of the hash makes this an equality, not an
    approximation."""
    events = load_table(spark, SF_DIR, "events").withColumn("g", F.lit(1))
    a = events.filter(F.col("event_id") % 2 == 0)
    b = events.filter(F.col("event_id") % 2 == 1)
    whole = hll_sketch(events, ["g"], "user_id").collect()[0]["hll"]
    shards = hll_sketch(a, ["g"], "user_id").unionByName(
        hll_sketch(b, ["g"], "user_id")
    )
    merged = (
        shards.groupBy("g")
        .agg(hll_merge_agg("hll").alias("hll"))
        .collect()[0]["hll"]
    )
    assert list(merged) == list(whole)
    assert len(whole) == HLL_M


def test_rollup_pattern_day_to_range(spark):
    """Daily sketches merged over a date range match the sketch built
    directly on that range (the no-rescan rollup guarantee)."""
    events = load_table(spark, SF_DIR, "events").withColumn(
        "day", F.to_date("ts")
    )
    daily = hll_sketch(events, ["day"], "user_id")
    days = sorted(r["day"] for r in daily.select("day").distinct().collect())
    assert len(days) >= 2
    lo, hi = days[0], days[len(days) // 2]
    merged = (
        daily.filter((F.col("day") >= lo) & (F.col("day") <= hi))
        .groupBy()
        .agg(hll_merge_agg("hll").alias("hll"))
        .select(hll_estimate("hll").alias("est"))
        .collect()[0]["est"]
    )
    direct_df = events.filter((F.col("day") >= lo) & (F.col("day") <= hi))
    direct = (
        hll_sketch(direct_df.withColumn("g", F.lit(1)), ["g"], "user_id")
        .select(hll_estimate("hll").alias("est"))
        .collect()[0]["est"]
    )
    assert merged == direct  # same registers → identical estimate
    exact = direct_df.select("user_id").distinct().count()
    assert abs(merged - exact) / exact < exact_error_bound(exact)


def test_sketches_survive_parquet_roundtrip(spark, tmp_path):
    """The persistence story: write sketch rows, read them back, merge —
    byte-stable registers through the parquet boundary."""
    events = load_table(spark, SF_DIR, "events").withColumn(
        "day", F.to_date("ts")
    )
    daily = hll_sketch(events, ["day"], "user_id")
    p = str(tmp_path / "sketches")
    daily.write.parquet(p)
    back = spark.read.parquet(p)
    a = {str(r["day"]): list(r["hll"]) for r in daily.collect()}
    b = {str(r["day"]): list(r["hll"]) for r in back.collect()}
    assert a == b
