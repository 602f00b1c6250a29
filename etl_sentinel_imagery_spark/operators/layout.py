"""Multi-column data-clustering layout (Z-order) for scan pruning.

At 100 TB the scan is the query: a table laid out so that every file
holds a narrow range of EVERY filter column lets parquet row-group
statistics (and partition-level file skipping) eliminate most of the
input for multi-dimensional predicates — the effect Delta's OPTIMIZE
ZORDER and ClickHouse's ORDER BY tuples exploit. Sorting by one column
only prunes that column; interleaving the bits of several rank-
normalized columns (a Z-order / Morton curve) prunes all of them at
once, at a small cost to each.

Spark-first shape: quantile cut points come from one `approxQuantile`
pass (driver gets B doubles per column, never the data); bucket mapping
and bit interleaving are pure JVM expressions; the physical clustering
is `repartitionByRange(zval)` + `sortWithinPartitions(zval)` — exactly
the write-side shuffle Spark already optimizes, so the operator adds no
new machinery at scale. A Hilbert curve (better locality, pricier
mapping) can swap in behind the same zval column if needed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Bits per dimension: 64 buckets — plenty to separate files (a layout
#: with F files only needs ~log2(F) distinguishable buckets per dim).
DEFAULT_BITS = 6


def _bucketize(col: Column, boundaries: list[float]) -> Column:
    """value → quantile bucket index in [0, len(boundaries)]: count of
    interior cut points ≤ value (fold over the boundary array — B adds
    per row, no join, no sort)."""
    barr = F.array(*[F.lit(float(b)) for b in boundaries])
    return F.aggregate(
        barr,
        F.lit(0),
        lambda acc, b: acc + F.when(col >= b, 1).otherwise(0),
    )


def _interleave(bucket_cols: list[Column], bits: int) -> Column:
    """Morton interleave: bit j of dim c lands at position j*ndims + c."""
    n = len(bucket_cols)
    z = F.lit(0).cast("long")
    for c, col in enumerate(bucket_cols):
        v = col.cast("long")
        for j in range(bits):
            z = z + F.shiftleft(
                F.shiftright(v, j).bitwiseAND(F.lit(1)), j * n + c
            )
    return z


def with_zorder(
    df: DataFrame,
    cols: list[str],
    bits: int = DEFAULT_BITS,
    relative_error: float = 0.001,
) -> DataFrame:
    """Add a ``zval`` column: Morton code over the quantile-rank buckets
    of ``cols`` (numeric/date/timestamp). Quantile ranks (not raw values)
    make the curve robust to skew — each bucket holds ~equal row counts
    regardless of the value distribution."""
    if not cols:
        raise ValueError("need at least one column to z-order")
    probs = [i / (1 << bits) for i in range(1, 1 << bits)]

    def as_double(c: str) -> Column:
        # date→double is not a valid cast; route temporals through
        # timestamp (epoch seconds)
        dt = df.schema[c].dataType.typeName()
        col = F.col(c)
        if dt in ("date", "timestamp", "timestamp_ntz"):
            col = col.cast("timestamp")
        return col.cast("double")

    casted = df.select(
        "*", *[as_double(c).alias(f"__z_{c}") for c in cols]
    )
    cuts = casted.stat.approxQuantile(
        [f"__z_{c}" for c in cols], probs, relative_error
    )
    buckets = [
        _bucketize(F.col(f"__z_{c}"), sorted(set(cut)))
        for c, cut in zip(cols, cuts)
    ]
    return casted.withColumn("zval", _interleave(buckets, bits)).drop(
        *[f"__z_{c}" for c in cols]
    )


def zorder_layout(
    df: DataFrame,
    cols: list[str],
    n_files: int,
    bits: int = DEFAULT_BITS,
) -> DataFrame:
    """Cluster ``df`` into ``n_files`` output partitions along the
    Z-curve of ``cols``: range-partition on zval (contiguous curve
    segments per file) and sort within each partition (contiguous row
    groups within the file). Write the result with
    ``.write.parquet(...)`` — every file then covers a narrow range of
    every clustered column, which is what the scan planner prunes on."""
    return (
        with_zorder(df, cols, bits)
        .repartitionByRange(n_files, "zval")
        .sortWithinPartitions("zval")
    )
