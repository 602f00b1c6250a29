"""Mergeable HyperLogLog sketches as first-class DataFrame values.

`approx_count_distinct` answers one query; a 100 TB pipeline wants the
SKETCH itself — persisted per (day, segment) partition, merged across
arbitrary slices later without touching raw data (the rollup-table
pattern: daily sketch parquet → any date-range distinct-users query is a
register-wise max + one estimate, not a re-scan).

Registers are plain `array<int>` columns built from JVM expressions
(md5-based 60-bit hash — the same engine-portable family as
operators.sampling, so a DuckDB oracle could restate the registers
bit-for-bit), merge is an element-wise max (`zip_with`), and the
estimator is the standard HLL harmonic mean with the linear-counting
small-range correction. Merge is EXACT: sketch(A ∪ B) ==
merge(sketch(A), sketch(B)) register-for-register, which is what makes
pre-aggregation sound.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Precision: 2^9 = 512 registers, standard error 1.04/√512 ≈ 4.6%.
HLL_P = 9
HLL_M = 1 << HLL_P
#: Hash width: 15 md5 hex chars = 60 bits (fits int64); P index bits +
#: 51 substream bits.
_HASH_BITS = 60
_SUB_BITS = _HASH_BITS - HLL_P
_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)


def _hash60(key: Column) -> Column:
    return F.conv(F.substring(F.md5(key.cast("string")), 1, 15), 16, 10).cast(
        "long"
    )


def hll_sketch(
    df: DataFrame, group_cols: list[str], key_col: str
) -> DataFrame:
    """Per-group HLL registers: (group_cols..., hll array<int>).

    Two-phase shape: (group, register-index) max-of-rho — map-side
    combinable, the heavy shuffle carries ≤ m rows per group — then one
    small per-group assembly of the dense register array."""
    h = _hash60(F.col(key_col))
    idx = h.bitwiseAND(F.lit(HLL_M - 1))
    w = F.shiftright(h, HLL_P)
    # rho = leading-zero count of the 51-bit substream + 1. Bit length
    # comes from the BINARY-STRING length (conv base 10→2) — an exact
    # integer path; floor(log2(w)) computed as ln(w)/ln(2) in doubles
    # can be off by one at exact powers of two, and differently so per
    # engine, which would silently skew registers.
    rho = (
        F.when(w == 0, F.lit(_SUB_BITS + 1))
        .otherwise(F.lit(_SUB_BITS + 1) - F.length(F.conv(w, 10, 2)))
        .cast("int")
    )
    per_reg = (
        df.select(*group_cols, idx.alias("_idx"), rho.alias("_rho"))
        .groupBy(*group_cols, "_idx")
        .agg(F.max("_rho").alias("_mx"))
    )
    dense = F.transform(
        F.sequence(F.lit(0), F.lit(HLL_M - 1)),
        lambda i: F.coalesce(F.element_at(F.col("_regmap"), i.cast("int")), F.lit(0)),
    )
    return (
        per_reg.groupBy(*group_cols)
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct(F.col("_idx").cast("int"), F.col("_mx")))
            ).alias("_regmap")
        )
        .select(*group_cols, dense.alias("hll"))
    )


def hll_merge_cols(a: Column, b: Column) -> Column:
    """Register-wise max — the exact, associative, commutative merge."""
    return F.zip_with(a, b, lambda x, y: F.greatest(x, y))


def hll_merge_agg(col: Column | str) -> Column:
    """Aggregate many sketch rows into one (fold of register-wise max) —
    use inside groupBy().agg() to roll daily sketches up to any slice."""
    c = F.col(col) if isinstance(col, str) else col
    return F.aggregate(
        F.collect_list(c),
        F.transform(F.sequence(F.lit(0), F.lit(HLL_M - 1)), lambda _: F.lit(0)),
        hll_merge_cols,
    )


def hll_estimate(col: Column | str) -> Column:
    """Cardinality estimate from a register array (harmonic mean +
    linear-counting small-range correction), as a JVM expression. The
    harmonic sum is a sequential fold, so the double result is
    deterministic for given registers."""
    c = F.col(col) if isinstance(col, str) else col
    inv_sum = F.aggregate(
        c,
        F.lit(0.0),
        lambda acc, r: acc + F.lit(2.0) ** (-r.cast("double")),
    )
    raw = F.lit(_ALPHA * HLL_M * HLL_M) / inv_sum
    zeros = F.size(F.filter(c, lambda r: r == 0))
    linear = F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / zeros)
    return F.when(
        (raw <= F.lit(2.5 * HLL_M)) & (zeros > 0), linear
    ).otherwise(raw)


def distinct_rollup(
    df: DataFrame,
    fine_cols: list[str],
    key_col: str,
) -> DataFrame:
    """The end-to-end rollup pattern: sketch at the FINE grain once
    (e.g. per day × segment); callers then merge to any coarser slice
    with ``groupBy(coarse).agg(hll_merge_agg('hll'))`` + hll_estimate —
    never re-reading raw data. Returns (fine_cols..., hll)."""
    return hll_sketch(df, fine_cols, key_col)


def exact_error_bound(n_distinct: int) -> float:
    """±3σ relative error bound for this precision (for tests/monitors)."""
    return 3 * 1.04 / math.sqrt(HLL_M)
