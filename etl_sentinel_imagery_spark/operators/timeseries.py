"""Time-series completion operators: gap-filling resample and
forward fill.

Aggregating events into time buckets silently DROPS empty buckets —
downstream consumers (anomaly detectors, charts, schedulers reading
"events per hour") need the zero rows to exist. The reference has no
time-series surface; these extend the events battery family
(queries/events_q.py, operators/asof.py) with the two standard
completion steps:

- `resample_counts`: per group, a COMPLETE bucket axis from the group's
  own min to max bucket (`F.sequence` over timestamps — one array per
  group, exploded; bounded by time-range/step, not by row count), left-
  joined against the observed aggregates with zero fill.
- `forward_fill`: last-seen-value propagation over ordered rows — the
  canonical `last(value, ignorenulls=True)` running window per group.

Scale: resample shuffles on the group key twice (agg + join) — both
map-side combinable / broadcastable when the bucket axis is small;
forward_fill is one window per group with no extra shuffle beyond the
partitionBy. Both are pure built-in expressions, restatable in SQL
(DuckDB `generate_series` + `last_value IGNORE NULLS`), which the tests
exercise cross-engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def resample_counts(
    events: DataFrame,
    ts_col: str,
    step: str,
    group_cols: list[str],
    agg_exprs: dict[str, Column] | None = None,
) -> DataFrame:
    """Per-group bucketized aggregates over a COMPLETE bucket axis.

    Returns (group_cols..., bucket timestamp, n_events, <agg_exprs...>)
    with one row for EVERY ``step``-aligned bucket between each group's
    first and last event — empty buckets carry n_events=0 and NULL for
    the custom aggregates. ``step`` is an interval literal ('1 hour').
    """
    # epoch-arithmetic alignment for every step (one code path; under
    # the pinned-UTC session it matches date_trunc for whole-unit
    # steps). floor, NOT cast("long"): cast truncates toward zero, which
    # would misalign pre-1970 timestamps upward into the wrong bucket
    bucket = F.timestamp_seconds(
        F.floor(
            F.unix_timestamp(F.col(ts_col)) / _step_seconds(step)
        ).cast("long")
        * _step_seconds(step)
    )
    aggs = [F.count(F.lit(1)).alias("n_events")] + [
        expr.alias(name) for name, expr in (agg_exprs or {}).items()
    ]
    observed = (
        events.withColumn("bucket", bucket)
        .groupBy(*group_cols, "bucket")
        .agg(*aggs)
    )
    axis = (
        observed.groupBy(*group_cols)
        .agg(F.min("bucket").alias("_lo"), F.max("bucket").alias("_hi"))
        .select(
            *group_cols,
            F.explode(
                F.sequence("_lo", "_hi", F.expr(f"INTERVAL {step}"))
            ).alias("bucket"),
        )
    )
    filled = axis.join(observed, [*group_cols, "bucket"], "left")
    return filled.withColumn(
        "n_events", F.coalesce("n_events", F.lit(0).cast("long"))
    )


def _step_seconds(step: str) -> int:
    qty, unit = step.split()
    mult = {
        "second": 1, "seconds": 1,
        "minute": 60, "minutes": 60,
        "hour": 3600, "hours": 3600,
        "day": 86400, "days": 86400,
    }[unit]
    return int(qty) * mult


def forward_fill(
    df: DataFrame,
    order_col: str,
    value_cols: list[str],
    group_cols: list[str],
) -> DataFrame:
    """Replace NULLs in ``value_cols`` with the last non-null value in
    ``order_col`` order within each group (rows before the first
    non-null stay NULL)."""
    w = (
        Window.partitionBy(*group_cols)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = df
    for c in value_cols:
        out = out.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return out


def rolling_zscore(
    counts: DataFrame,
    key_cols: list[str],
    bucket_col: str,
    value_col: str,
    n_buckets: int = 4,
) -> DataFrame:
    """Per-key rolling z-score over the trailing ``n_buckets`` buckets
    (current inclusive) of a GAP-FILLED count table — the standard
    monitoring/anomaly signal ("is this bucket's count unusual vs its
    recent baseline").

    Run it on resample_counts output, not raw groupBy counts: gap
    filling makes the ROWS frame a true TIME window (absent buckets
    exist as zeros; on a sparse table a ROWS frame would silently span
    arbitrary time). All statistics derive from EXACT integer sums
    (Σv, Σv² as bigint over a window frame), so mean/variance/z are a
    fixed sequence of double ops both engines reproduce bit-for-bit —
    the same exact-moments trick as agg_battery2's variance. Adds
    ``roll_mean``, ``roll_z`` (0.0 where the frame has <2 buckets or
    zero variance — NULL-free for engine-portable hashing)."""
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(bucket_col)
        .rowsBetween(-(n_buckets - 1), 0)
    )
    v = F.col(value_col).cast("long")
    s = F.sum(v).over(w)
    s2 = F.sum(v * v).over(w)
    c = F.count(v).over(w)
    mean = s.cast("double") / c
    var = (
        s2.cast("double") - s.cast("double") * s.cast("double") / c
    ) / (c - F.lit(1))
    z = F.when(
        (c > 1) & (var > 0),
        (v.cast("double") - mean) / F.sqrt(var),
    ).otherwise(F.lit(0.0))
    return counts.select(
        "*", mean.alias("roll_mean"), z.alias("roll_z")
    )


def ewma(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    value_col: str,
    alpha: float = 0.25,
    out_col: str = "ewma",
) -> DataFrame:
    """Exponentially-weighted moving average per group, the O(axis)
    PRODUCTION form of the oracle anchor in
    ``queries/events_q.py::events_windows_battery`` (whose per-position
    prefix re-fold is O(axis²) — bought bit-identical cross-engine
    doubles for the correctness gate, but a 10-year hourly axis would
    pay ~4·10⁹ fold steps per group; this operator pays one step per
    bucket).

    One ``applyInPandas`` per group: the recurrence
    ``acc = acc·(1−α) + α·x`` runs as a ufunc ACCUMULATE over the
    time-sorted values — a single C-driven sequential scan, O(axis)
    time and memory. The arithmetic is the IDENTICAL IEEE op sequence
    as the oracle's fold (same multiply-then-add shape, same order),
    so the two forms agree BIT-FOR-BIT, which the test pins — the
    production path is not an approximation of the anchor.

    100 TB shape: the shuffle is one hash exchange on the group key;
    each group's axis is time-bounded (buckets, not rows), so a group
    fits an Arrow batch by construction. NULL values are a contract
    violation: run on gap-filled input (``resample_counts``), the same
    precondition as the rolling z-score."""
    import numpy as np
    import pandas as pd

    one_minus = 1.0 - alpha

    def _ew(pdf: pd.DataFrame) -> pd.DataFrame:
        # built per-task: a frompyfunc ufunc doesn't pickle
        step = np.frompyfunc(
            lambda a, x: a * one_minus + alpha * x, 2, 1
        )
        pdf = pdf.sort_values(order_col, kind="mergesort")
        vals = pdf[value_col].to_numpy(dtype="float64")
        if len(vals):
            # seed with α·x₀ == fold from acc=0.0, matching the oracle
            acc = step.accumulate(
                np.concatenate(([0.0], vals)), dtype=object
            )[1:]
            pdf = pdf.assign(**{out_col: acc.astype("float64")})
        else:
            pdf = pdf.assign(**{out_col: np.zeros(0)})
        return pdf

    out_fields = df.schema.fields
    schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in out_fields
    ) + f", `{out_col}` double"
    return df.groupBy(*key_cols).applyInPandas(_ew, schema=schema)
