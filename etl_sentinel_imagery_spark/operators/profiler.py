"""One-pass data profiler: per-column stats for table triage.

Before curating 100 TB you profile it: row count, null fractions,
distinct cardinalities, ranges, moments, quantiles, heavy hitters —
per column. The reference has nothing like it (its only "profiling"
is ``len(self.products)`` guards, `imagery_store.py:241`); this is
standard warehouse tooling rebuilt Spark-first.

Shape: ONE global aggregation computes every exact stat and every
sketchable stat for ALL columns simultaneously — a single scan with
map-side partial aggregation and a one-row result (control-plane
sized by construction). Distinct counts use Spark's built-in HLL++
(``approx_count_distinct``), quantiles the built-in
``percentile_approx`` (Greenwald-Khanna) — both mergeable JVM
aggregates, no Python in the path. Optional heavy hitters add one
combinable groupBy + ``orderBy().limit()`` (TakeOrderedAndProject)
per requested column — the same scale-safe election the pipeline
monitor uses.

The one-row agg result is collected (one row IS the control plane)
and reshaped driver-side into a tidy long-form DataFrame — one row
per column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

NUMERIC_TYPES = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)

PROFILE_SCHEMA = T.StructType([
    T.StructField("column", T.StringType()),
    T.StructField("dtype", T.StringType()),
    T.StructField("n", T.LongType()),
    T.StructField("n_null", T.LongType()),
    T.StructField("null_frac", T.DoubleType()),
    T.StructField("n_distinct_est", T.LongType()),
    T.StructField("min", T.StringType()),
    T.StructField("max", T.StringType()),
    T.StructField("mean", T.DoubleType()),
    T.StructField("stddev", T.DoubleType()),
    T.StructField("p50", T.DoubleType()),
    T.StructField("p90", T.DoubleType()),
    T.StructField("p99", T.DoubleType()),
    T.StructField(
        "top_values",
        T.ArrayType(
            T.StructType([
                T.StructField("value", T.StringType()),
                T.StructField("count", T.LongType()),
            ])
        ),
    ),
])


def _is_numeric(dt: T.DataType) -> bool:
    return isinstance(dt, NUMERIC_TYPES)


def _is_orderable(dt: T.DataType) -> bool:
    return isinstance(
        dt,
        NUMERIC_TYPES
        + (T.StringType, T.DateType, T.TimestampType, T.BooleanType),
    )


def profile_table(
    df: DataFrame,
    cols: list[str] | None = None,
    topk: int = 0,
    rsd: float = 0.05,
) -> DataFrame:
    """Profile ``cols`` (default: all) → long-form DataFrame, one row
    per column (schema: PROFILE_SCHEMA). ``topk > 0`` adds per-column
    heavy hitters (one extra combinable groupBy per column — request
    it for categorical columns, not free-text)."""
    cols = cols or df.columns
    dtypes = dict(zip(df.schema.names, [f.dataType for f in df.schema.fields]))
    exprs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        dt = dtypes[c]
        col = F.col(c)
        exprs.append(
            F.sum(col.isNull().cast("long")).alias(f"{c}__nnull")
        )
        exprs.append(
            F.approx_count_distinct(col, rsd).alias(f"{c}__dist")
        )
        if _is_orderable(dt):
            exprs.append(F.min(col).cast("string").alias(f"{c}__min"))
            exprs.append(F.max(col).cast("string").alias(f"{c}__max"))
        if _is_numeric(dt):
            d = col.cast("double")
            exprs.append(F.avg(d).alias(f"{c}__mean"))
            exprs.append(F.stddev_samp(d).alias(f"{c}__std"))
            exprs.append(
                F.percentile_approx(
                    d, [0.5, 0.9, 0.99], 10000
                ).alias(f"{c}__q")
            )
    row = df.agg(*exprs).collect()[0].asDict()

    tops: dict[str, list] = {}
    if topk > 0:
        for c in cols:
            hh = (
                df.select(F.col(c).cast("string").alias("v"))
                .where(F.col("v").isNotNull())
                .groupBy("v")
                .agg(F.count(F.lit(1)).alias("cnt"))
                .orderBy(F.desc("cnt"), F.asc("v"))
                .limit(topk)
                .collect()
            )
            tops[c] = [(r["v"], r["cnt"]) for r in hh]

    n = row["__n"]
    out = []
    for c in cols:
        q = row.get(f"{c}__q") or [None, None, None]
        out.append((
            c,
            dtypes[c].simpleString(),
            n,
            row[f"{c}__nnull"],
            (row[f"{c}__nnull"] / n) if n else 0.0,
            row[f"{c}__dist"],
            row.get(f"{c}__min"),
            row.get(f"{c}__max"),
            row.get(f"{c}__mean"),
            row.get(f"{c}__std"),
            q[0], q[1], q[2],
            tops.get(c),
        ))
    return df.sparkSession.createDataFrame(out, PROFILE_SCHEMA)


DRIFT_SCHEMA = T.StructType([
    T.StructField("column", T.StringType()),
    T.StructField("status", T.StringType()),  # ok|added|removed|drift
    T.StructField("null_frac_delta", T.DoubleType()),
    T.StructField("distinct_ratio", T.DoubleType()),
    T.StructField("mean_shift_sigmas", T.DoubleType()),
    T.StructField("p50_shift_sigmas", T.DoubleType()),
    T.StructField("range_widened", T.BooleanType()),
    T.StructField("dtype_changed", T.BooleanType()),
])


def profile_drift(
    old: DataFrame,
    new: DataFrame,
    null_frac_tol: float = 0.05,
    distinct_ratio_tol: float = 2.0,
    mean_sigma_tol: float = 3.0,
) -> DataFrame:
    """Compare two :func:`profile_table` snapshots → one drift row per
    column — the scheduled-ingest monitoring complement (run the
    profiler per batch, diff against yesterday, alert on ``status !=
    'ok'``).

    Shift metrics are scale-free: mean/p50 movement in units of the
    OLD stddev, distinct cardinality as a ratio, null fraction as an
    absolute delta. Thresholds mark ``drift``; schema changes surface
    as ``added``/``removed``/``dtype_changed``. Both inputs are
    already column-count-sized — everything here is control-plane."""
    o = {r["column"]: r for r in old.collect()}
    nw = {r["column"]: r for r in new.collect()}
    rows = []
    for c in sorted(set(o) | set(nw)):
        if c not in nw:
            rows.append((c, "removed", None, None, None, None, None, None))
            continue
        if c not in o:
            rows.append((c, "added", None, None, None, None, None, None))
            continue
        a, b = o[c], nw[c]
        nf_delta = b["null_frac"] - a["null_frac"]
        dr = (
            b["n_distinct_est"] / a["n_distinct_est"]
            if a["n_distinct_est"]
            else None
        )
        sigma = a["stddev"] if a["stddev"] else None
        mean_shift = (
            abs(b["mean"] - a["mean"]) / sigma
            if sigma and a["mean"] is not None and b["mean"] is not None
            else None
        )
        p50_shift = (
            abs(b["p50"] - a["p50"]) / sigma
            if sigma and a["p50"] is not None and b["p50"] is not None
            else None
        )
        widened = None
        if a["min"] is not None and b["min"] is not None:
            try:  # numeric ranges compare numerically, others lexically
                widened = float(b["min"]) < float(a["min"]) or float(
                    b["max"]
                ) > float(a["max"])
            except ValueError:
                widened = b["min"] < a["min"] or b["max"] > a["max"]
        dtype_changed = a["dtype"] != b["dtype"]
        drift = (
            dtype_changed
            or abs(nf_delta) > null_frac_tol
            or (
                dr is not None
                and (dr > distinct_ratio_tol or dr < 1 / distinct_ratio_tol)
            )
            or (mean_shift is not None and mean_shift > mean_sigma_tol)
        )
        rows.append((
            c,
            "drift" if drift else "ok",
            nf_delta,
            dr,
            mean_shift,
            p50_shift,
            widened,
            dtype_changed,
        ))
    return old.sparkSession.createDataFrame(rows, DRIFT_SCHEMA)
