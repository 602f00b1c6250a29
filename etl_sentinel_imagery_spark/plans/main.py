"""Batch entry point — the reference's CLI run (§3.1), composed.

`download_imagery.py:34-49`: Hydra config → AOI load → AreaDataset →
(commented-out) per-tile loop with failure tolerance. This is that flow
with the intended semantics: config dataclass → AOI reader → one
acquisition per AOI row, per-row failure tolerance (a failing AOI logs
and continues — the try/except the reference sketched), results unioned
into one DataFrame of product records + cache writes.

The loop is over AOIs (a handful of control-plane rows); each iteration
schedules distributed work. Thousands of AOIs would instead join the AOI
table against the catalog in one plan — noted in PERF.md.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame, SparkSession

from etl_sentinel_imagery_spark.plans.acquisition import BandSource, acquire
from etl_sentinel_imagery_spark.sources.config import AcquisitionConfig
from etl_sentinel_imagery_spark.sources.geo_readers import (
    read_aoi_csv,
    read_aoi_geojson,
)

log = logging.getLogger(__name__)


def read_aoi(spark: SparkSession, path: str) -> DataFrame:
    if path.endswith((".geojson", ".json")):
        return read_aoi_geojson(spark, path)
    if path.endswith(".csv"):
        return read_aoi_csv(spark, path)
    raise ValueError(f"unsupported AOI format: {path}")


def run(
    spark: SparkSession,
    config: AcquisitionConfig,
    catalog: DataFrame,
    source: BandSource,
    cache_dir: str | None = None,
) -> list[DataFrame]:
    """One acquisition per AOI row; failures are tolerated per-row
    (download_imagery.py:44-49 intended semantics)."""
    if config.aoi_path is None:
        raise ValueError("config.aoi_path is required")
    aois = read_aoi(spark, config.aoi_path).collect()
    results: list[DataFrame] = []
    for row in aois:
        bbox = (
            row["bbox"]["minx"],
            row["bbox"]["miny"],
            row["bbox"]["maxx"],
            row["bbox"]["maxy"],
        )
        try:
            out = acquire(
                spark,
                catalog,
                bbox,
                config.selection_params(),
                config.bands,
                source,
                cache_dir=cache_dir,
                normalize=config.normalize,
            )
            results.append(out)
        except Exception:  # per-AOI fault tolerance, keep the batch going
            log.exception("AOI fid=%s failed; continuing", row["fid"])
    return results
