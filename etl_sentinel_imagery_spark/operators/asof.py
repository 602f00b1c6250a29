"""As-of and range joins — temporal operators Spark lacks natively.

As-of join (for each left row, the latest right row with ts ≤ left.ts,
same key) via the merged-stream window technique: union both sides with a
side tag, one window per key carries the last-seen right payload forward,
then keep left rows. Cost: ONE shuffle on the key — no range-condition
nested loop, no per-key pd.merge_asof python. This is the scalable form:
state per partition is a single carried value.

Range join (count/collect right rows within a trailing time window of
each left row) via bucketized equi-join: both sides bucket their
timestamps at window width; each left row joins buckets {b-1, b} and
post-filters the exact range — turning an unbounded theta-join into an
equi-join with 2× fan-out.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    right_payload: list[str],
    strict: bool = False,
) -> DataFrame:
    """For each left row: columns of the latest right row with
    right.ts ≤ left.ts (or < when strict) and equal key. Right payload
    columns come back `asof_`-prefixed (null when no match).

    Ties on right.ts must be pre-deduplicated by the caller for
    deterministic payloads."""
    lcols = left.columns
    l_tagged = left.select(
        *lcols, F.lit(1).alias("_side"), *[F.lit(None).alias(f"_r_{c}") for c in right_payload]
    )
    r_tagged = right.select(
        F.col(key),
        F.col(ts),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c not in (key, ts)],
        F.lit(0).alias("_side"),
        *[F.col(c).alias(f"_r_{c}") for c in right_payload],
    ).select(*lcols, "_side", *[f"_r_{c}" for c in right_payload])

    merged = l_tagged.unionByName(r_tagged)
    # right rows sort before left at equal ts → ≤ semantics; after for strict <
    side_order = F.asc("_side") if not strict else F.desc("_side")
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts).asc(), side_order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = merged.select(
        *lcols,
        "_side",
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"asof_{c}")
            for c in right_payload
        ],
    )
    return carried.filter(F.col("_side") == 1).drop("_side")


def range_join_count(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts_us: Column,
    right_ts_us: Column,
    window_us: int,
    count_alias: str = "n_in_window",
) -> DataFrame:
    """left + count of right rows with same key and
    right_ts ∈ (left_ts − window, left_ts]. Bucketized equi-join.

    Left rows need no uniqueness precondition: an internal per-row id
    joins the re-group key, so fully duplicate left rows each keep their
    own output row instead of collapsing with summed hits."""
    l = (
        left.withColumn("_lrow", F.monotonically_increasing_id())
        .withColumn("_lus", left_ts_us)
        .withColumn("_lb", (F.col("_lus") / window_us).cast("long"))
    )
    r = (
        right.withColumn("_rus", right_ts_us)
        .withColumn("_rb", (F.col("_rus") / window_us).cast("long"))
        .select(F.col(key).alias("_rkey"), "_rus", "_rb")
    )
    probe = l.withColumn("_b", F.explode(F.array(F.col("_lb"), F.col("_lb") - 1)))
    joined = probe.join(
        r,
        (probe["_b"] == r["_rb"]) & (probe[key] == r["_rkey"]),
        "left",
    ).withColumn(
        "_hit",
        F.when(
            (F.col("_rus").isNotNull())
            & (F.col("_rus") <= F.col("_lus"))
            & (F.col("_rus") > F.col("_lus") - window_us),
            1,
        ).otherwise(0),
    )
    out_cols = [c for c in left.columns]
    return (
        joined.groupBy(*[F.col(c) for c in out_cols], F.col("_lus"), F.col("_lrow"))
        .agg(F.sum("_hit").alias(count_alias))
        .drop("_lus", "_lrow")
    )
