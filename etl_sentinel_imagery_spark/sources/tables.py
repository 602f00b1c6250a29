"""Parquet table sources for the driver's synthetic star schema.

The reference's sources are a CSV/GeoJSON AOI reader and a remote OData
catalog (`/root/reference/code/download_imagery.py:16-30`,
`imagery_store.py:216-224`); here the equivalent relational inputs are the
driver-materialized parquet tables. Reading through ``spark.read.parquet``
gives Catalyst predicate pushdown + column pruning for free — the Spark
analogue of the reference pushing its `$filter` string server-side
(SURVEY.md §4).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: Dimension tables small enough to broadcast at any scale factor —
#: region/nation are fixed-cardinality; the rest scale with SF.
BROADCAST_DIMS = ("region", "nation")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        return _load_events(spark, path)
    return spark.read.parquet(path)


def _load_events(spark: SparkSession, path: str) -> DataFrame:
    """Normalize events.ts to a session-TZ timestamp across driver testdata
    generations: older drops stored INT64 TIMESTAMP(NANOS) (rejected by the
    Spark reader without the legacy conf), newer drops store TIMESTAMP(US)
    without tz (read as TIMESTAMP_NTZ). Both land as TIMESTAMP under the
    UTC session zone — the same instants DuckDB sees — so oracle parity
    holds regardless of which generation is on disk."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    prev = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    try:
        raw = spark.read.parquet(path)
        if isinstance(raw.schema["ts"].dataType, T.LongType):
            ts = F.timestamp_micros(F.expr("ts div 1000"))
        else:  # timestamp or timestamp_ntz — unify on session-TZ timestamp
            ts = F.col("ts").cast("timestamp")
        return raw.withColumn("ts", ts).select(
            "event_id", "ts", "user_id", "event_type", "value", "props"
        )
    finally:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", prev)


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so queries can use spark.sql."""
    for n in TABLES:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)
