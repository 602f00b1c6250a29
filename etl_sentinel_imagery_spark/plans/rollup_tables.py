"""Materialized sketch rollup tables — answer any-slice questions
without re-scanning raw data.

The pattern every 100 TB metrics pipeline converges on: aggregate ONCE
at the finest useful grain (here day × event_type) into MERGEABLE
summaries, persist them partitioned by the slicing key, and serve every
later question — "distinct users last quarter", "top users in March",
"value distribution for purchases" — by merging a handful of sketch
rows. The raw events can age out to cold storage; the rollup table is
thousands of rows however large the corpus was.

One build pass produces, per (day, event_type):

- ``n_events``          exact count
- ``hll``               sparse HLL of user_id (operators.sketches) —
                        distinct users under any later grouping
- ``top_items``/``top_off``  top-k user map + truncation offset
- ``value_hist``        fixed-edge histogram of the value column

All four merge exactly (max / sum / bounded re-truncation), so slice
answers are the SAME as sketching the slice directly — the property the
tests pin. The table is day-partitioned: a date-range question prunes
to its partitions (PartitionFilters, asserted in tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_sentinel_imagery_spark.operators.sketches import (
    HLL_P,
    histogram_merge_agg,
    histogram_sketch,
    hll_estimate_sparse,
    hll_sketch_sparse,
    hll_sparse_merge_agg,
    topk_merge_agg,
    topk_sketch,
)

#: Fixed value-histogram edges for the events rollup.
VALUE_EDGES = [10.0, 50.0, 200.0]
#: Heavy-hitter budget per (day, type) cell.
TOP_K = 8


def build_rollup_table(
    events: DataFrame,
    out_dir: str,
    p: int = HLL_P,
    k: int = TOP_K,
) -> None:
    """One pass over events → day-partitioned sketch table."""
    base = events.select(
        F.to_date("ts").alias("day"),
        "event_type",
        "user_id",
        "value",
    )
    grain = ["day", "event_type"]
    counts = base.groupBy(*grain).agg(F.count(F.lit(1)).alias("n_events"))
    hll = hll_sketch_sparse(base, grain, "user_id", p=p)
    top = topk_sketch(base, grain, "user_id", k=k).select(
        *grain,
        F.col("items").alias("top_items"),
        F.col("off").alias("top_off"),
    )
    hist = histogram_sketch(base, grain, "value", VALUE_EDGES).select(
        *grain, F.col("hist").alias("value_hist")
    )
    from etl_sentinel_imagery_spark.operators.kll import kll_sketch

    kll = kll_sketch(base, grain, "value")
    # hist/kll are LEFT-joined: the value sketches drop a
    # (day, event_type) group whose value column is all NULL
    # (COUNT(value) semantics), and an inner join here would silently
    # drop that cell's exact count, HLL, and top-k too. Mirror
    # run_additive_sketch_rollup: keep the cell, coalesce the histogram
    # to the all-zero array, and leave kll NULL (kll_merge_rows skips
    # NULLs at read time).
    zero_hist = F.array(
        *[F.lit(0).cast("long") for _ in range(len(VALUE_EDGES) + 1)]
    )
    (
        counts.join(hll, grain)
        .join(top, grain)
        .join(hist, grain, "left")
        .withColumn("value_hist", F.coalesce("value_hist", zero_hist))
        .join(kll, grain, "left")
        .write.mode("overwrite")
        .partitionBy("day")
        .parquet(out_dir)
    )


def read_slice(
    spark: SparkSession, table_dir: str, day_lo, day_hi, event_type=None
) -> DataFrame:
    """Date-range (and optional type) slice — the day filter lands on
    the partition column, so unneeded days are never read."""
    df = spark.read.parquet(table_dir).filter(
        (F.col("day") >= F.lit(day_lo)) & (F.col("day") <= F.lit(day_hi))
    )
    if event_type is not None:
        df = df.filter(F.col("event_type") == event_type)
    return df


def slice_summary(
    spark: SparkSession,
    table_dir: str,
    day_lo,
    day_hi,
    event_type=None,
    p: int = HLL_P,
    k: int = TOP_K,
) -> DataFrame:
    """The whole slice answered from sketches in one row: exact event
    count, distinct-user estimate, merged top-k user map + offset, the
    merged value histogram, and KLL value quantiles (p50/p90/p99).

    The KLL merge happens driver-side over the slice's sketch rows —
    the rollup table is control-plane-sized by construction (one row
    per day × type), and KLL's compaction is algorithmic, not an
    expression; rows merge in (day, event_type) order so the answer is
    replay-deterministic."""
    from etl_sentinel_imagery_spark.operators.kll import kll_merge_rows

    sl = read_slice(spark, table_dir, day_lo, day_hi, event_type)
    kll_rows = (
        sl.select("day", "event_type", "kll")
        .collect()
    )
    merged_kll = kll_merge_rows(
        r["kll"] for r in sorted(
            kll_rows, key=lambda r: (str(r["day"]), r["event_type"])
        )
    )
    q50, q90, q99 = (merged_kll.quantile(q) for q in (0.5, 0.9, 0.99))
    merged = sl.groupBy().agg(
        F.sum("n_events").alias("n_events"),
        hll_sparse_merge_agg("hll").alias("hll"),
        topk_merge_agg("top_items", "top_off", k).alias("top"),
        histogram_merge_agg("value_hist", len(VALUE_EDGES) + 1).alias(
            "value_hist"
        ),
    )
    return merged.select(
        "n_events",
        hll_estimate_sparse("hll", p=p).alias("est_distinct_users"),
        F.col("top.items").alias("top_items"),
        F.col("top.off").alias("top_off"),
        "value_hist",
        F.lit(q50).cast("double").alias("value_p50"),
        F.lit(q90).cast("double").alias("value_p90"),
        F.lit(q99).cast("double").alias("value_p99"),
    )
