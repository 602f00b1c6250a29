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


def _as_double(df: DataFrame, c: str) -> Column:
    # date→double is not a valid cast; route temporals through
    # timestamp (epoch seconds)
    dt = df.schema[c].dataType.typeName()
    col = F.col(c)
    if dt in ("date", "timestamp", "timestamp_ntz"):
        col = col.cast("timestamp")
    return col.cast("double")


def compute_zorder_cuts(
    df: DataFrame,
    cols: list[str],
    bits: int = DEFAULT_BITS,
    relative_error: float = 0.001,
) -> dict[str, list[float]]:
    """Quantile cut points per column (one approxQuantile pass). Persist
    these (save_zorder_cuts) and reuse them across a steady ingest so
    every write's files land on the SAME curve — freshly-derived cuts
    per write would drift as the distribution does, making file ranges
    mutually inconsistent between compactions."""
    probs = [i / (1 << bits) for i in range(1, 1 << bits)]
    casted = df.select(*[_as_double(df, c).alias(f"__z_{c}") for c in cols])
    cuts = casted.stat.approxQuantile(
        [f"__z_{c}" for c in cols], probs, relative_error
    )
    return {c: sorted(set(cut)) for c, cut in zip(cols, cuts)}


def save_zorder_cuts(spark, path: str, cuts: dict[str, list[float]]) -> None:
    """Persist cut points as JSON via the Hadoop FileSystem API (works on
    local paths and object stores alike)."""
    import json

    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    out = fs.create(hpath, True)
    out.write(bytearray(json.dumps(cuts).encode("utf-8")))
    out.close()


def load_zorder_cuts(spark, path: str) -> dict[str, list[float]]:
    import json

    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    stream = fs.open(hpath)
    try:
        data = bytes(
            spark._jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
        )
    finally:
        stream.close()
    return json.loads(data.decode("utf-8"))


def with_zorder(
    df: DataFrame,
    cols: list[str],
    bits: int = DEFAULT_BITS,
    relative_error: float = 0.001,
    cuts: dict[str, list[float]] | None = None,
) -> DataFrame:
    """Add a ``zval`` column: Morton code over the quantile-rank buckets
    of ``cols`` (numeric/date/timestamp). Quantile ranks (not raw values)
    make the curve robust to skew — each bucket holds ~equal row counts
    regardless of the value distribution. Pass persisted ``cuts``
    (compute_zorder_cuts/load_zorder_cuts) to keep successive writes on
    one consistent curve; otherwise cuts derive from ``df`` itself."""
    if not cols:
        raise ValueError("need at least one column to z-order")
    if cuts is None:
        cuts = compute_zorder_cuts(df, cols, bits, relative_error)
    missing = [c for c in cols if c not in cuts]
    if missing:
        raise ValueError(f"cuts missing for columns: {missing}")
    casted = df.select(
        "*", *[_as_double(df, c).alias(f"__z_{c}") for c in cols]
    )
    buckets = [
        _bucketize(F.col(f"__z_{c}"), cuts[c]) for c in cols
    ]
    return casted.withColumn("zval", _interleave(buckets, bits)).drop(
        *[f"__z_{c}" for c in cols]
    )


def zorder_layout(
    df: DataFrame,
    cols: list[str],
    n_files: int,
    bits: int = DEFAULT_BITS,
    cuts: dict[str, list[float]] | None = None,
) -> DataFrame:
    """Cluster ``df`` into ``n_files`` output partitions along the
    Z-curve of ``cols``: range-partition on zval (contiguous curve
    segments per file) and sort within each partition (contiguous row
    groups within the file). Write the result with
    ``.write.parquet(...)`` — every file then covers a narrow range of
    every clustered column, which is what the scan planner prunes on."""
    return (
        with_zorder(df, cols, bits, cuts=cuts)
        .repartitionByRange(n_files, "zval")
        .sortWithinPartitions("zval")
    )


def _hilbert_2d(x0: Column, y0: Column, bits: int) -> Column:
    """Hilbert curve index of 2-D bucket coords (the classic xy2d walk,
    public domain — Wikipedia's formulation), unrolled into ``bits``
    rounds of pure expressions. Unlike Morton, the Hilbert curve is
    CONTINUOUS: consecutive indices are always grid neighbors, so a
    contiguous file segment never spans the diagonal jumps Z-order
    takes — measurably tighter per-file bounding boxes on range-heavy
    workloads."""
    n1 = F.lit((1 << bits) - 1).cast("long")
    init = F.struct(
        x0.cast("long").alias("x"),
        y0.cast("long").alias("y"),
        F.lit(0).cast("long").alias("d"),
    )

    # an F.aggregate fold, NOT an unrolled python loop: each round's
    # (x, y) feed the next, so inlined substitution would grow the
    # expression tree exponentially in `bits` (measured: OOMed codegen
    # at bits=6). The fold evaluates iteratively at runtime — the same
    # reason polyhash is a fold.
    def step(acc: Column, i: Column) -> Column:
        x, y, d = acc["x"], acc["y"], acc["d"]
        s = F.pow(F.lit(2.0), i.cast("double")).cast("long")
        rx = F.when(x.bitwiseAND(s) > 0, 1).otherwise(0).cast("long")
        ry = F.when(y.bitwiseAND(s) > 0, 1).otherwise(0).cast("long")
        d2 = d + s * s * (rx * 3).bitwiseXOR(ry)
        # rot(): when ry==0, reflect (if rx==1) against the FULL grid
        # (n-1, not s-1) then swap axes
        refl_x = F.when(rx == 1, n1 - x).otherwise(x)
        refl_y = F.when(rx == 1, n1 - y).otherwise(y)
        nx = F.when(ry == 0, refl_y).otherwise(x)
        ny = F.when(ry == 0, refl_x).otherwise(y)
        return F.struct(nx.alias("x"), ny.alias("y"), d2.alias("d"))

    seq = F.sequence(F.lit(bits - 1), F.lit(0), F.lit(-1))
    return F.aggregate(seq, init, step)["d"]


def with_hilbert(
    df: DataFrame,
    cols: list[str],
    bits: int = DEFAULT_BITS,
    relative_error: float = 0.001,
    cuts: dict[str, list[float]] | None = None,
) -> DataFrame:
    """Add an ``hval`` column: Hilbert index over the quantile-rank
    buckets of exactly TWO columns (the curve generalizes to d>2 but
    2-D covers the dominant pair-clustering case; use with_zorder for
    wider key sets). Same cut-persistence contract as with_zorder."""
    if len(cols) != 2:
        raise ValueError("with_hilbert clusters exactly 2 columns")
    if cuts is None:
        cuts = compute_zorder_cuts(df, cols, bits, relative_error)
    missing = [c for c in cols if c not in cuts]
    if missing:
        raise ValueError(f"cuts missing for columns: {missing}")
    casted = df.select(
        "*", *[_as_double(df, c).alias(f"__z_{c}") for c in cols]
    )
    bx = _bucketize(F.col(f"__z_{cols[0]}"), cuts[cols[0]])
    by = _bucketize(F.col(f"__z_{cols[1]}"), cuts[cols[1]])
    return casted.withColumn("hval", _hilbert_2d(bx, by, bits)).drop(
        *[f"__z_{c}" for c in cols]
    )


def hilbert_layout(
    df: DataFrame,
    cols: list[str],
    n_files: int,
    bits: int = DEFAULT_BITS,
    cuts: dict[str, list[float]] | None = None,
) -> DataFrame:
    """zorder_layout's Hilbert twin: range-partition + sort on hval."""
    return (
        with_hilbert(df, cols, bits, cuts=cuts)
        .repartitionByRange(n_files, "hval")
        .sortWithinPartitions("hval")
    )
