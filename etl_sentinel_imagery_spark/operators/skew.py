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


def diagnose_skew(df: DataFrame, key_col: str, top: int = 10) -> dict:
    """Key-skew report to run BEFORE committing a shuffle on
    ``key_col``: per-key counts (map-side combinable), the top-``top``
    hottest keys via ``orderBy().limit()`` (TakeOrderedAndProject),
    and one small aggregate for totals. Returns::

        {n_rows, n_keys, top1_share, gini_top,
         suggested_salt, top: [(key, count, share), ...]}

    ``suggested_salt`` sizes :func:`salted_sum_count`'s shard count so
    the hottest key's work spreads to roughly one average reducer's
    share (ceil(top1 / (n_rows / shuffle.partitions)), min 1) — the
    number you pass as ``n_salts``. ``gini_top`` is the share of all
    rows held by the top keys — a quick boilerplate/hot-tenant smell
    test. Cost: one combinable groupBy + one tiny agg; nothing
    corpus-sized reaches the driver."""
    counts = df.groupBy(F.col(key_col).alias("_k")).agg(
        F.count(F.lit(1)).alias("_c")
    )
    totals = counts.agg(
        F.sum("_c").alias("rows"), F.count(F.lit(1)).alias("keys")
    ).collect()[0]
    n_rows, n_keys = totals["rows"] or 0, totals["keys"]
    hot = (
        counts.orderBy(F.desc("_c"), F.asc("_k")).limit(top).collect()
    )
    shuffle_parts = int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
    )
    top1 = hot[0]["_c"] if hot else 0
    per_reducer = max(n_rows / max(shuffle_parts, 1), 1.0)
    return {
        "n_rows": n_rows,
        "n_keys": n_keys,
        "top1_share": (top1 / n_rows) if n_rows else 0.0,
        "gini_top": (sum(r["_c"] for r in hot) / n_rows) if n_rows else 0.0,
        "suggested_salt": max(1, -(-top1 // int(per_reducer))),
        "top": [
            (r["_k"], r["_c"], r["_c"] / n_rows) for r in hot
        ],
    }
