"""Temporal join battery: as-of join + range join over the events table.

DuckDB has a native ASOF JOIN, which makes a clean semantic oracle for
the merged-stream window implementation in operators.asof.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_sentinel_imagery_spark.operators.asof import as_of_join, range_join_count
from etl_sentinel_imagery_spark.queries.base import Q
from etl_sentinel_imagery_spark.sources.tables import load_table

WINDOW_US = 600 * 1_000_000  # 10 minutes


def _dedup_clicks(events: DataFrame) -> DataFrame:
    """One click per (user, ts): max event_id wins — makes as-of payloads
    deterministic under timestamp ties on the right side."""
    clicks = events.filter(F.col("event_type") == "click")
    w = Window.partitionBy("user_id", "ts").orderBy(F.desc("event_id"))
    return (
        clicks.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("event_id", "user_id", "ts")
    )


def _purchase_asof_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each purchase: the user's latest click at-or-before it."""
    events = load_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = _dedup_clicks(events)
    joined = as_of_join(
        purchases, clicks, key="user_id", ts="ts", right_payload=["event_id", "ts"]
    )
    return joined.select(
        "event_id",
        "user_id",
        "ts",
        F.col("asof_event_id").alias("click_event_id"),
        F.col("asof_ts").alias("click_ts"),
        (F.unix_micros(F.col("ts")) - F.unix_micros(F.col("asof_ts"))).alias("gap_us"),
    )


_ASOF_SQL = """
WITH clicks AS (
    SELECT event_id, user_id, ts
    FROM (
        SELECT event_id, user_id, ts, ROW_NUMBER() OVER (
            PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
        FROM events WHERE event_type = 'click'
    ) WHERE rn = 1
),
purchases AS (
    SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
)
SELECT p.event_id AS event_id, p.user_id AS user_id, p.ts AS ts,
       c.event_id AS click_event_id, c.ts AS click_ts,
       epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
FROM purchases p
ASOF LEFT JOIN clicks c ON p.user_id = c.user_id AND p.ts >= c.ts
"""


def _error_preceding_clicks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each error event: how many clicks the same user made in the
    preceding 10 minutes (inclusive of the error instant)."""
    events = load_table(spark, sf_dir, "events")
    errors = events.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    clicks = events.filter(F.col("event_type") == "click").select("user_id", "ts")
    return range_join_count(
        errors,
        clicks,
        key="user_id",
        left_ts_us=F.unix_micros(F.col("ts")),
        right_ts_us=F.unix_micros(F.col("ts")),
        window_us=WINDOW_US,
        count_alias="n_clicks_10m",
    )


_RANGE_SQL = f"""
SELECT e.event_id AS event_id, e.user_id AS user_id, e.ts AS ts,
       COUNT(c.user_id) AS n_clicks_10m
FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error') e
LEFT JOIN (SELECT user_id, ts FROM events WHERE event_type = 'click') c
  ON c.user_id = e.user_id
 AND epoch_us(c.ts) <= epoch_us(e.ts)
 AND epoch_us(c.ts) > epoch_us(e.ts) - {WINDOW_US}
GROUP BY 1, 2, 3
"""


QUERIES: dict[str, Q] = {
    "purchase_asof_click": Q(
        _purchase_asof_click, _ASOF_SQL,
        "as-of join via merged-stream window (vs DuckDB native ASOF JOIN)",
    ),
    "error_preceding_clicks": Q(
        _error_preceding_clicks, _RANGE_SQL,
        "trailing-window range join via bucketized equi-join",
    ),
}
