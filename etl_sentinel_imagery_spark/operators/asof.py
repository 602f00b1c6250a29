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


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_col: str,
    end_col: str,
    bin_width: int,
    key: str | None = None,
    how: str = "inner",
    max_bins_per_interval: int = 100_000,
) -> DataFrame:
    """General point-in-interval join (right rows are [start, end]
    ranges, both inclusive, arbitrary lengths) via multi-bin bucketing —
    the equi-join form of a theta-join Spark would otherwise plan as a
    broadcast-nested-loop scan.

    Each interval explodes to every ``bin_width``-aligned bin it covers;
    each point carries its single containing bin. The equi-join on
    (key?, bin) meets every (point, interval) candidate in EXACTLY ONE
    bin — the point's own — so no post-join dedup is needed; an exact
    range filter finishes the predicate. Fan-out per interval is
    ceil(len/width)+1, so pick ``bin_width`` near the typical interval
    length: shorter widths shrink candidate sets but multiply interval
    copies. An interval exploding past ``max_bins_per_interval`` raises
    rather than silently producing a mega-task (a year-long interval at
    1-second bins is a plan bug, not data).

    ``how="left"`` keeps matchless points with NULL interval columns.
    Interval columns come back ``iv_``-prefixed.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"unsupported join type {how!r}")
    # count the TRUE fan-out — floor(end/w) - floor(start/w) + 1, exactly
    # what the sequence() below emits — not the (end-start)/w length
    # ratio, which undercounts by up to 2 bins near bin boundaries
    guard = (
        F.floor(F.col(end_col) / bin_width)
        - F.floor(F.col(start_col) / bin_width)
        + F.lit(1)
    )
    iv = (
        intervals
        # assert_true inside a filter is NOT prunable (unlike a dropped
        # projection column), so the mega-interval guard always runs
        .where(
            F.assert_true(
                guard <= max_bins_per_interval,
                F.format_string(
                    "interval spans more than %d bins; widen bin_width",
                    F.lit(max_bins_per_interval),
                ),
            ).isNull()
        )
        .select(
            *[F.col(c).alias(f"iv_{c}") for c in intervals.columns],
            # floor, not cast: cast truncates toward zero and misaligns
            # negative timestamps (the resample_counts lesson)
            F.explode(
                F.sequence(
                    F.floor(F.col(start_col) / bin_width).cast("long"),
                    F.floor(F.col(end_col) / bin_width).cast("long"),
                )
            ).alias("_ivbin"),
        )
    )
    pt = points.withColumn(
        "_ptbin", F.floor(F.col(point_ts) / bin_width).cast("long")
    )
    cond = F.col("_ptbin") == F.col("_ivbin")
    if key is not None:
        cond = cond & (F.col(key) == F.col(f"iv_{key}"))
    in_range = (
        (F.col(point_ts) >= F.col(f"iv_{start_col}"))
        & (F.col(point_ts) <= F.col(f"iv_{end_col}"))
    )
    if how == "inner":
        return pt.join(iv, cond & in_range).drop("_ptbin", "_ivbin")
    return pt.join(iv, cond & in_range, "left").drop("_ptbin", "_ivbin")
