"""Event analytics battery — SURVEY.md §2.10 streaming-parity extensions.

The reference has no streaming layer; these are the batch-mode equivalents
of the Structured Streaming operators (tumbling/sliding windows,
sessionization, watermark-style dedup), each verifiable against the DuckDB
oracle. The live ``readStream`` wrappers over the same logic live in
``etl_sentinel_imagery_spark.streaming``.

Cross-engine determinism: all time arithmetic in integer MICROSECONDS
(Spark ``unix_micros`` ≡ DuckDB ``epoch_us``); event sums accumulate as
decimal(12,2) (values are 2-decimal); window/tumble starts computed by
integer floor-division so bucket edges are exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_sentinel_imagery_spark.functions.exact import dec
from etl_sentinel_imagery_spark.queries.base import Q
from etl_sentinel_imagery_spark.sources.tables import load_table

US = 1_000_000
TUMBLE_S = 900  # 15 minutes
SLIDE_S = 300  # 5 minutes
SLIDE_LEN_S = 600  # 10-minute sliding windows
SESSION_GAP_US = 1800 * US  # 30-minute session gap


def _windows_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 15-min windows per event_type (F.window ≡ epoch floor) ∪
    sliding 10-min windows every 5 min (each event lands in 2 windows) ∪
    gap-FILLED 6-hour resample per event_type (operators.timeseries —
    empty buckets exist with n_events=0, which plain groupBy drops),
    tagged by ``kind``. Sentinel values (-1.0 / -1, '') stand in for the
    columns the other kinds don't produce — NULL-free so both engines
    keep integer columns integer in pandas."""
    from etl_sentinel_imagery_spark.operators.timeseries import (
        resample_counts,
    )

    events = load_table(spark, sf_dir, "events")
    t_win = F.window(F.col("ts"), f"{TUMBLE_S} seconds")
    tumbling = (
        events.groupBy(
            t_win.start.alias("window_start"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(dec("value", 12, 2)).cast("double").alias("total_value"),
        )
        .select(
            F.lit("tumbling").alias("kind"),
            "window_start",
            "event_type",
            "n_events",
            "total_value",
            F.lit(-1).cast("bigint").alias("n_users"),
        )
    )
    s_win = F.window(F.col("ts"), f"{SLIDE_LEN_S} seconds", f"{SLIDE_S} seconds")
    sliding = (
        events.groupBy(s_win.start.alias("window_start"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .select(
            F.lit("sliding").alias("kind"),
            "window_start",
            F.lit("").alias("event_type"),
            "n_events",
            F.lit(-1.0).alias("total_value"),
            "n_users",
        )
    )
    base = resample_counts(events, "ts", "6 hours", ["event_type"])
    resampled = base.select(
        F.lit("resampled_6h").alias("kind"),
        F.col("bucket").alias("window_start"),
        "event_type",
        "n_events",
        F.lit(-1.0).alias("total_value"),
        F.lit(-1).cast("bigint").alias("n_users"),
    )
    # rolling anomaly signal over the SAME gap-filled axis: trailing-4-
    # bucket z-score per event_type (operators.timeseries.rolling_zscore
    # — exact integer moments, so the double result is engine-portable);
    # the z rides in total_value, the frame mean in... n_users stays -1
    from etl_sentinel_imagery_spark.operators.timeseries import rolling_zscore

    zscored = rolling_zscore(
        base, ["event_type"], "bucket", "n_events", n_buckets=4
    ).select(
        F.lit("rolling_z6h").alias("kind"),
        F.col("bucket").alias("window_start"),
        "event_type",
        "n_events",
        F.col("roll_z").alias("total_value"),
        F.lit(-1).cast("bigint").alias("n_users"),
    )
    # EWMA smoothing over the same gap-filled axis (alpha = 1/4, an
    # exact binary fraction): per position t the value is the SEQUENTIAL
    # left fold acc*(3/4) + (1/4)*x over the bucket prefix, restated in
    # DuckDB as the op-for-op identical list_reduce — bit-identical
    # doubles (the cosine-fold pattern). The per-position prefix re-fold
    # is O(axis²) per event_type, on the TIME AXIS only — bounded and
    # control-plane-sized at any corpus SF (the axis grows with days,
    # not rows). The PRODUCTION form is operators.timeseries.ewma — an
    # O(axis) ufunc-accumulate scan proven bit-identical to this fold
    # (tests/test_timeseries.py); this battery keeps the fold because
    # the DuckDB oracle restates it op-for-op.
    per_type = base.groupBy("event_type").agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("bucket"), F.col("n_events")))
        ).alias("_seq")
    )
    vals = F.transform(
        F.col("_seq"), lambda s: s["n_events"].cast("double")
    )
    ew_arr = F.transform(
        F.sequence(F.lit(1), F.size(F.col("_seq"))),
        lambda i: F.aggregate(
            F.slice(vals, F.lit(1), i),
            F.lit(0.0),
            lambda a, x: a * F.lit(0.75) + F.lit(0.25) * x,
        ),
    )
    ewma = (
        per_type.select("event_type", "_seq", ew_arr.alias("_ew"))
        .select(
            "event_type",
            F.posexplode(
                F.zip_with(
                    F.col("_seq"),
                    F.col("_ew"),
                    lambda s, e: F.struct(
                        s["bucket"].alias("b"),
                        s["n_events"].alias("n"),
                        e.alias("e"),
                    ),
                )
            ).alias("_pos", "_z"),
        )
        .select(
            F.lit("ewma_6h").alias("kind"),
            F.col("_z.b").alias("window_start"),
            "event_type",
            F.col("_z.n").alias("n_events"),
            F.col("_z.e").alias("total_value"),
            F.lit(-1).cast("bigint").alias("n_users"),
        )
    )
    return (
        tumbling.unionByName(sliding)
        .unionByName(resampled)
        .unionByName(zscored)
        .unionByName(ewma)
    )


#: Gap-filled 6-hour resample per event_type — shared by the windows
#: battery and the production-EWMA oracle (identical axis by text).
_RESAMPLED_CTE = f"""resampled AS (
    SELECT axis.event_type, axis.bucket, COALESCE(obs.n, 0) AS n_events
    FROM (
        SELECT event_type,
               unnest(generate_series(MIN(bucket), MAX(bucket),
                                      INTERVAL 6 HOUR)) AS bucket
        FROM (
            SELECT event_type,
                   make_timestamp((epoch_us(ts) // {21600 * US}) * {21600 * US})
                       AS bucket
            FROM events
        )
        GROUP BY 1
    ) axis
    LEFT JOIN (
        SELECT event_type,
               make_timestamp((epoch_us(ts) // {21600 * US}) * {21600 * US})
                   AS bucket,
               COUNT(*) AS n
        FROM events
        GROUP BY 1, 2
    ) obs USING (event_type, bucket)
)"""

_WINDOWS_BATTERY_SQL = f"""
WITH {_RESAMPLED_CTE}
SELECT 'tumbling' AS kind,
       make_timestamp((epoch_us(ts) // {TUMBLE_S * US}) * {TUMBLE_S * US}) AS window_start,
       event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value,
       CAST(-1 AS BIGINT) AS n_users
FROM events
GROUP BY 1, 2, 3
UNION ALL
SELECT 'sliding' AS kind, window_start, '' AS event_type,
       COUNT(*) AS n_events,
       -1.0 AS total_value,
       COUNT(DISTINCT user_id) AS n_users
FROM (
    SELECT make_timestamp(
               (epoch_us(ts) // {SLIDE_S * US}) * {SLIDE_S * US} - offs.o * {SLIDE_S * US}
           ) AS window_start,
           user_id
    FROM events
    CROSS JOIN (VALUES (0), (1)) offs(o)
)
GROUP BY 1, 2, 3
UNION ALL
SELECT 'resampled_6h' AS kind, bucket AS window_start, event_type,
       n_events,
       -1.0 AS total_value,
       CAST(-1 AS BIGINT) AS n_users
FROM resampled
UNION ALL
SELECT 'rolling_z6h' AS kind, bucket AS window_start, event_type,
       n_events,
       CASE WHEN c > 1 AND
                 (CAST(s2 AS DOUBLE) - CAST(s AS DOUBLE)*CAST(s AS DOUBLE)/c)
                     / (c - 1) > 0
            THEN (CAST(n_events AS DOUBLE) - CAST(s AS DOUBLE)/c)
                 / sqrt((CAST(s2 AS DOUBLE)
                         - CAST(s AS DOUBLE)*CAST(s AS DOUBLE)/c) / (c - 1))
            ELSE 0.0 END AS total_value,
       CAST(-1 AS BIGINT) AS n_users
FROM (
    SELECT event_type, bucket, n_events,
           SUM(n_events) OVER fr AS s,
           SUM(n_events * n_events) OVER fr AS s2,
           COUNT(n_events) OVER fr AS c
    FROM resampled
    WINDOW fr AS (PARTITION BY event_type ORDER BY bucket
                  ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
)
UNION ALL
SELECT 'ewma_6h' AS kind, bks[i] AS window_start, event_type,
       ns[i] AS n_events,
       -- op-for-op the Spark fold: left fold over the bucket prefix,
       -- seed 0.0, acc*0.75 + 0.25*x — bit-identical doubles
       list_reduce(
           list_prepend(CAST(0.0 AS DOUBLE),
               list_transform(list_slice(ns, 1, i),
                              x -> CAST(x AS DOUBLE))),
           (a, x) -> a * 0.75 + 0.25 * x) AS total_value,
       CAST(-1 AS BIGINT) AS n_users
FROM (
    SELECT event_type,
           list(bucket ORDER BY bucket) AS bks,
           list(n_events ORDER BY bucket) AS ns
    FROM resampled GROUP BY 1
), UNNEST(generate_series(1, len(ns))) u(i)
"""


def _ewma_production(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The O(axis) PRODUCTION EWMA (operators.timeseries.ewma — one
    ufunc-accumulate scan per group via applyInPandas) under the
    strict hash oracle: the DuckDB side restates the recurrence as the
    per-position prefix re-fold (the battery's ewma_6h form), and the
    two agree bit-for-bit because the operator executes the IDENTICAL
    IEEE op sequence in one pass. This is the row that pins the
    pandas-UDF scale path — not just its quadratic oracle twin — to
    cross-engine exactness on driver data."""
    from etl_sentinel_imagery_spark.operators.timeseries import (
        ewma,
        resample_counts,
    )

    events = load_table(spark, sf_dir, "events")
    base = resample_counts(events, "ts", "6 hours", ["event_type"])
    return ewma(
        base, ["event_type"], "bucket", "n_events", alpha=0.25,
        out_col="ewma_val",
    ).select(
        "event_type",
        F.col("bucket").alias("window_start"),
        "n_events",
        "ewma_val",
    )


_EWMA_PRODUCTION_SQL = f"""
WITH {_RESAMPLED_CTE}
SELECT event_type, bks[i] AS window_start, ns[i] AS n_events,
       list_reduce(
           list_prepend(CAST(0.0 AS DOUBLE),
               list_transform(list_slice(ns, 1, i),
                              x -> CAST(x AS DOUBLE))),
           (a, x) -> a * 0.75 + 0.25 * x) AS ewma_val
FROM (
    SELECT event_type,
           list(bucket ORDER BY bucket) AS bks,
           list(n_events ORDER BY bucket) AS ns
    FROM resampled GROUP BY 1
), UNNEST(generate_series(1, len(ns))) u(i)
"""


def _sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: 30-min inactivity gap → lag + cumulative session id
    (the batch equivalent of session_window; SURVEY §2.10)."""
    events = load_table(spark, sf_dir, "events")
    order_w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    with_gap = events.select(
        "user_id",
        "event_id",
        "ts",
        F.unix_micros(F.col("ts")).alias("ts_us"),
        F.lag(F.unix_micros(F.col("ts"))).over(order_w).alias("prev_us"),
    ).withColumn(
        "new_session",
        F.when(
            F.col("prev_us").isNull()
            | ((F.col("ts_us") - F.col("prev_us")) > SESSION_GAP_US),
            1,
        ).otherwise(0),
    )
    sess_w = order_w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    with_id = with_gap.withColumn("session_id", F.sum("new_session").over(sess_w))
    sessions = with_id.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    )
    # per-session purchase count via the general interval join
    # (operators.asof.interval_join): purchases are points on the
    # microsecond axis, sessions are [start, end] intervals keyed by
    # user — the bucketized equi-join form, oracle-checked against a
    # plain BETWEEN join
    from etl_sentinel_imagery_spark.operators.asof import interval_join

    pts = events.where(F.col("event_type") == "purchase").select(
        "user_id", F.unix_micros(F.col("ts")).alias("p_us")
    )
    iv = sessions.select(
        "user_id",
        "session_id",
        F.unix_micros(F.col("session_start")).alias("lo"),
        F.unix_micros(F.col("session_end")).alias("hi"),
    )
    hits = (
        interval_join(
            pts, iv, "p_us", "lo", "hi", 3_600_000_000, key="user_id"
        )
        .groupBy("iv_user_id", "iv_session_id")
        .agg(F.count(F.lit(1)).alias("n_purchases"))
    )
    return (
        sessions.join(
            hits,
            (sessions["user_id"] == hits["iv_user_id"])
            & (sessions["session_id"] == hits["iv_session_id"]),
            "left",
        )
        .select(
            "user_id",
            "session_id",
            "session_start",
            "session_end",
            "n_events",
            F.coalesce("n_purchases", F.lit(0)).alias("n_purchases"),
        )
    )


_SESSIONIZE_SQL = f"""
WITH sessions AS (
    SELECT user_id, session_id,
           MIN(ts) AS session_start,
           MAX(ts) AS session_end,
           COUNT(*) AS n_events
    FROM (
        SELECT user_id, event_id, ts,
               CAST(SUM(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                   AS session_id
        FROM (
            SELECT user_id, event_id, ts,
                   CASE WHEN prev_us IS NULL
                             OR (epoch_us(ts) - prev_us) > {SESSION_GAP_US}
                        THEN 1 ELSE 0 END AS new_session
            FROM (
                SELECT user_id, event_id, ts,
                       LAG(epoch_us(ts)) OVER (
                           PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
                FROM events
            )
        )
    )
    GROUP BY 1, 2
),
-- the interval join restated as the plain BETWEEN theta-join the
-- bucketized operator replaces (microsecond axis both engines)
purch AS (
    SELECT s.user_id, s.session_id, COUNT(*) AS n_purchases
    FROM sessions s
    JOIN events p
      ON p.user_id = s.user_id
     AND p.event_type = 'purchase'
     AND epoch_us(p.ts) >= epoch_us(s.session_start)
     AND epoch_us(p.ts) <= epoch_us(s.session_end)
    GROUP BY 1, 2
)
SELECT s.user_id, s.session_id, s.session_start, s.session_end,
       s.n_events, COALESCE(p.n_purchases, 0) AS n_purchases
FROM sessions s
LEFT JOIN purch p
  ON p.user_id = s.user_id AND p.session_id = s.session_id
"""


#: Funnel config carried by events_dedup_first (operators.funnel).
FUNNEL_STEPS = ["view", "click", "purchase"]
FUNNEL_WINDOW_S = 6 * 3600


def _dedup_first_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed dedup keeping the earliest occurrence — the batch analogue of
    dropDuplicatesWithinWatermark (and the reference's idempotent
    uuid-keyed cache sink, tx.py:92-96) — PLUS the per-user funnel state
    from operators.funnel (view → click → purchase, 6-hour pairwise
    window) joined on: the per-level DP restated independently in the
    oracle as a DuckDB list_reduce fold, so the funnel operator sits
    under the strict-hash gate."""
    from etl_sentinel_imagery_spark.operators.funnel import funnel_progress

    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    deduped = (
        events.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", "event_id", "ts")
    )
    funnel = funnel_progress(
        events, FUNNEL_STEPS, window_seconds=FUNNEL_WINDOW_S
    ).select(
        F.col("entity").alias("user_id"),
        F.col("steps_completed").alias("funnel_steps"),
        F.concat_ws(
            ",", F.transform("level_ts", lambda x: x.cast("string"))
        ).alias("funnel_levels"),
    )
    return deduped.join(funnel, "user_id")


_FUNNEL_STEP_CASE = " ".join(
    f"WHEN '{s}' THEN {i + 1}" for i, s in enumerate(FUNNEL_STEPS)
)
_FUNNEL_K = len(FUNNEL_STEPS)
_DEDUP_FIRST_SQL = f"""
WITH funnel AS (
    SELECT user_id,
           len(list_filter(levels, x -> x >= 0)) AS funnel_steps,
           array_to_string(
               list_transform(levels, x -> CAST(x AS VARCHAR)), ',')
               AS funnel_levels
    FROM (
        SELECT user_id,
            list_reduce(
              list_prepend(
                [{", ".join(["CAST(-1 AS BIGINT)"] * _FUNNEL_K)}],
                list_transform(
                  list_sort(list(struct_pack(
                      t := epoch_us(ts) // 1000000, e := event_type))),
                  ev -> [ev.t,
                         CASE ev.e {_FUNNEL_STEP_CASE} ELSE 0 END,
                         CAST(0 AS BIGINT)]
                )
              ),
              (acc, ev) -> list_transform(range(1, {_FUNNEL_K + 1}), j ->
                CASE WHEN ev[2] = j
                      AND (j = 1 OR (acc[j-1] >= 0 AND ev[1] >= acc[j-1]
                                     AND ev[1] - acc[j-1] <= {FUNNEL_WINDOW_S}))
                     THEN greatest(acc[j], ev[1]) ELSE acc[j] END)
            ) AS levels
        FROM events
        GROUP BY 1
    )
)
SELECT d.user_id, d.event_type, d.event_id, d.ts,
       f.funnel_steps, f.funnel_levels
FROM (
    SELECT user_id, event_type, event_id, ts
    FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY user_id, event_type ORDER BY ts, event_id) AS rn
        FROM events
    )
    WHERE rn = 1
) d
JOIN funnel f USING (user_id)
"""


def _scalar_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event scalar battery: lag/lead inter-event gaps (whole
    microseconds), the F11 clip-scale-cast normalization the reference
    applies to reflectance (`tx.py:20-23`: clip(x/s, 0, 1)*255 → uint8)
    on the value column, and the F14 JSON property decode
    (get_json_object over the props payload — formerly the standalone
    events_json_props query; the grouped-agg machinery it also exercised
    is covered by the aggregation batteries). floor() keeps the final
    int cast identical across engines (Spark truncates double→int,
    DuckDB rounds)."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    scaled = F.least(
        F.greatest(F.col("value") / F.lit(200.0), F.lit(0.0)), F.lit(1.0)
    ) * F.lit(255.0)
    k_val = F.get_json_object(F.col("props"), "$.k").cast("int")
    return events.select(
        "event_id",
        "user_id",
        "ts",
        (F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts"))).over(w))
        .alias("gap_us"),
        F.lead("event_type").over(w).alias("next_type"),
        F.floor(scaled).cast("int").alias("value_u8"),
        k_val.alias("k_val"),
        F.when(k_val > 50, "hi").otherwise("lo").alias("k_band"),
    )


_SCALAR_BATTERY_SQL = """
SELECT event_id, user_id, ts,
       epoch_us(ts) - LAG(epoch_us(ts)) OVER w AS gap_us,
       LEAD(event_type) OVER w AS next_type,
       CAST(floor(least(greatest(value / 200.0, 0.0), 1.0) * 255.0) AS INTEGER) AS value_u8,
       CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val,
       CASE WHEN CAST(json_extract_string(props, '$.k') AS INTEGER) > 50
            THEN 'hi' ELSE 'lo' END AS k_band
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


QUERIES: dict[str, Q] = {
    "events_windows_battery": Q(
        _windows_battery, _WINDOWS_BATTERY_SQL,
        "tumbling + sliding windows + gap-filled resample (batch oracle of the streaming ops)",
    ),
    "events_sessionize": Q(_sessionize, _SESSIONIZE_SQL, "sessionization via lag+cumsum"),
    "events_dedup_first": Q(
        _dedup_first_event, _DEDUP_FIRST_SQL,
        "keyed dedup keep-earliest + per-user funnel DP state",
    ),
    "events_scalar_battery": Q(
        _scalar_battery, _SCALAR_BATTERY_SQL,
        "lag/lead gaps + F11 clip-scale-cast + F14 JSON decode",
    ),
    "events_ewma_production": Q(
        _ewma_production, _EWMA_PRODUCTION_SQL,
        "O(axis) applyInPandas EWMA scan, bit-identical to the quadratic oracle fold",
    ),
}
