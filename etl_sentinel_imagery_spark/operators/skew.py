"""Skew-resistant aggregation: salted two-phase group-by.

At 100 TB a handful of hot keys (one giant customer, one dominant tile)
can pin a single reducer. The classic fix: salt the key into S shards,
partially aggregate per (key, salt) — map-side combine keeps this cheap —
then aggregate the S partials per key. Answers are identical to a plain
groupBy for any commutative-associative aggregate; the oracle states the
plain-groupBy answer.

(AQE's skew-join handling covers JOIN skew; aggregation skew still wants
salting when key cardinality is tiny relative to cluster width.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_sum_count(
    df: DataFrame,
    key_cols: list[str],
    sum_expr: Column,
    n_salts: int = 16,
    sum_alias: str = "total",
    count_alias: str = "n",
) -> DataFrame:
    """Two-phase salted aggregation: exact decimal/integer accumulators
    survive the re-aggregation unchanged (order-independent)."""
    salted = df.withColumn("_salt", F.pmod(F.crc32(F.monotonically_increasing_id().cast("string")), F.lit(n_salts)))
    partial = salted.groupBy(*key_cols, "_salt").agg(
        F.sum(sum_expr).alias("_psum"),
        F.count(F.lit(1)).alias("_pcnt"),
    )
    return partial.groupBy(*key_cols).agg(
        F.sum("_psum").alias(sum_alias),
        F.sum("_pcnt").alias(count_alias),
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-proof equi-join: salt the BIG side's key into n_salts shards
    and replicate the SMALL side once per shard, so one hot key spreads
    over n_salts reducers instead of pinning one.

    This is the fallback for when AQE's skew-join split cannot apply —
    the small side too big to broadcast but small enough to replicate
    ×n_salts, or a non-shuffle-join plan forced by the surrounding
    pipeline. Row-for-row identical to ``big.join(small, key, how)``;
    supports 'inner' and 'left' (the salted right side would drop
    unmatched right rows under 'right'/'outer')."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how}")
    salted_big = big.withColumn(
        "_salt",
        F.pmod(F.crc32(F.monotonically_increasing_id().cast("string")), F.lit(n_salts)),
    )
    replicated = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("_salt", F.col("_salt").cast(salted_big.schema["_salt"].dataType))
    return salted_big.join(replicated, [key, "_salt"], how).drop("_salt")
