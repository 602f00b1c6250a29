"""SparkSession factory.

Defaults are chosen for (a) deterministic parity with the DuckDB oracle
(UTC session timezone — Spark timestamps are session-TZ, DuckDB's are
UTC-naive) and (b) scale-minded execution (AQE with partition coalescing
and skew-join handling; Arrow for every pandas-UDF boundary).

At 100 TB the same code runs unchanged: ``spark.sql.shuffle.partitions``
is the only local-mode concession (32 ≈ local core count; a real cluster
leaves AQE to coalesce from a few thousand).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def get_spark(
    app_name: str = "etl-sentinel-imagery-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine's standard config."""
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = DEFAULT_SHUFFLE_PARTITIONS

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # Python DataSource pushFilters (sources.odata_source) is gated
        # off by default in Spark 4.1
        .config("spark.sql.python.filterPushdown.enabled", "true")
        .config("spark.ui.enabled", "false")
    )
    # Measured: a larger heap made the bench consistently SLOWER on this
    # box (G1 pause behavior with the default 1g was best: 14-18s vs
    # 16-27s at 8g) — so the default stays the JVM default; override via
    # SPARK_GRAFT_DRIVER_MEM only if a workload actually spills.
    if "SPARK_GRAFT_DRIVER_MEM" in os.environ:
        builder = builder.config(
            "spark.driver.memory", os.environ["SPARK_GRAFT_DRIVER_MEM"]
        )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def tune_session(spark: SparkSession) -> SparkSession:
    """Apply the engine's runtime confs to an externally-provided session.

    The verification driver passes its own SparkSession; this applies the
    confs that are settable post-startup (timezone, AQE, shuffle width) so
    queries behave identically there.
    """
    for k, v in {
        "spark.sql.session.timeZone": "UTC",
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.execution.arrow.pyspark.enabled": "true",
    }.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # immutable in this deployment — keep going
    return spark
