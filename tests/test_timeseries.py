"""Gap-filling resample + forward fill, cross-checked against DuckDB
(generate_series / IGNORE NULLS window) on the same events parquet."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from etl_sentinel_imagery_spark.operators.timeseries import (
    forward_fill,
    resample_counts,
)
from etl_sentinel_imagery_spark.sources.tables import load_table
from tests.conftest import SF_DIR


def test_resample_fills_gaps_and_matches_duckdb(spark):
    events = load_table(spark, SF_DIR, "events")
    got = {
        (r["event_type"], str(r["bucket"])): (r["n_events"], r["total_value"])
        for r in resample_counts(
            events,
            "ts",
            "6 hours",
            ["event_type"],
            {"total_value": F.round(F.sum("value"), 6)},
        ).collect()
    }
    con = duckdb.connect()
    want = {
        (r[0], str(r[1])): (r[2], r[3])
        for r in con.execute(
            f"""
            WITH obs AS (
                SELECT event_type,
                       to_timestamp(floor(epoch(ts) / 21600) * 21600)
                           AT TIME ZONE 'UTC' AS bucket,
                       COUNT(*) AS n, ROUND(SUM(value), 6) AS tv
                FROM '{SF_DIR}/events.parquet'
                GROUP BY 1, 2
            ),
            axis AS (
                SELECT event_type,
                       unnest(generate_series(MIN(bucket), MAX(bucket),
                                              INTERVAL 6 HOUR)) AS bucket
                FROM obs GROUP BY 1
            )
            SELECT axis.event_type, axis.bucket,
                   COALESCE(obs.n, 0), obs.tv
            FROM axis LEFT JOIN obs USING (event_type, bucket)
            """
        ).fetchall()
    }
    assert got == want
    # gaps actually exist and are zero-filled (the operator's point)
    assert any(n == 0 for n, _ in got.values()) or len(got) == len(
        [k for k, (n, _) in got.items() if n > 0]
    )


def test_forward_fill_matches_duckdb(spark):
    events = load_table(spark, SF_DIR, "events")
    # null out values on click events, then carry the last purchase value
    sparse = events.select(
        "user_id",
        "event_id",
        F.when(F.col("event_type") == "purchase", F.col("value")).alias("v"),
    )
    got = {
        r["event_id"]: r["v"]
        for r in forward_fill(sparse, "event_id", ["v"], ["user_id"]).collect()
    }
    con = duckdb.connect()
    want = {
        r[0]: r[1]
        for r in con.execute(
            f"""
            SELECT event_id,
                   LAST_VALUE(CASE WHEN event_type = 'purchase' THEN value END
                              IGNORE NULLS) OVER (
                       PARTITION BY user_id ORDER BY event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            FROM '{SF_DIR}/events.parquet'
            """
        ).fetchall()
    }
    assert got == want
    # both populated and leading-null rows exist (non-vacuous)
    vals = list(got.values())
    assert any(v is None for v in vals) and any(v is not None for v in vals)


def test_rolling_zscore_flags_planted_spike(spark):
    """A flat series with one planted spike: the spike bucket gets a
    large positive z; flat stretches get z=0 (zero variance guard)."""
    from etl_sentinel_imagery_spark.operators.timeseries import rolling_zscore

    rows = [("a", i, 10 if i != 6 else 100) for i in range(10)]
    counts = spark.createDataFrame(rows, "k string, bucket int, n long")
    got = {
        r["bucket"]: r
        for r in rolling_zscore(counts, ["k"], "bucket", "n").collect()
    }
    assert got[6]["roll_z"] > 1.4  # the spike stands out vs its frame
    assert got[3]["roll_z"] == 0.0  # flat frame → zero variance → 0
    assert abs(got[3]["roll_mean"] - 10.0) < 1e-12
    # frame is trailing: bucket 9's frame [6..9] still carries the spike
    assert got[9]["roll_z"] < 0.0  # 10 is below the spike-inflated mean


def test_ewma_production_form_bit_identical_to_fold(spark):
    """operators.timeseries.ewma (O(axis) ufunc accumulate) must equal
    the oracle anchor's O(axis²) prefix re-fold BIT-FOR-BIT — same
    IEEE op sequence, so == on doubles, no tolerance."""
    import time

    from etl_sentinel_imagery_spark.operators.timeseries import ewma

    rows = [
        ("a", t, float((t * 7919) % 101) / 3.0) for t in range(200)
    ] + [("b", t, float((t * 104729) % 97) / 7.0) for t in range(137)]
    df = spark.createDataFrame(rows, ["grp", "t", "v"]).repartition(8)

    got = {
        (r["grp"], r["t"]): r["ewma"]
        for r in ewma(df, ["grp"], "t", "v", alpha=0.25).collect()
    }

    # the oracle's formulation: per position, re-fold the full prefix
    per_grp = df.groupBy("grp").agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("t"), F.col("v")))
        ).alias("_seq")
    )
    vals = F.transform(F.col("_seq"), lambda s: s["v"])
    folds = F.transform(
        F.sequence(F.lit(1), F.size(F.col("_seq"))),
        lambda i: F.aggregate(
            F.slice(vals, F.lit(1), i),
            F.lit(0.0),
            lambda a, x: a * F.lit(0.75) + F.lit(0.25) * x,
        ),
    )
    want = {}
    for r in per_grp.select(
        "grp",
        F.posexplode(F.zip_with(F.col("_seq"), folds, lambda s, e: F.struct(
            s["t"].alias("t"), e.alias("e")
        ))).alias("_p", "_z"),
    ).collect():
        want[(r["grp"], r["_z"]["t"])] = r["_z"]["e"]

    assert got == want  # exact float equality, every position

    # O(axis): a 20k-bucket axis completes in seconds, where the
    # prefix re-fold form would pay 2·10⁸ fold steps
    big = spark.createDataFrame(
        [("x", t, float(t % 17)) for t in range(20_000)],
        ["grp", "t", "v"],
    )
    t0 = time.time()
    n = ewma(big, ["grp"], "t", "v").count()
    assert n == 20_000
    assert time.time() - t0 < 30
