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
