"""Acquisition pipeline — selection → fetch → transform → keyed cache.

The reference's end-to-end flow (`dataset.py:35-59` → `imagery_store.py:
37-77` → `tx.py:110-138`), composed from the engine's operators with the
reference's *intended* semantics (its latent bugs fixed — SURVEY.md §2.9:
`etl_process` → `etl_process_tile`, the double band_stack call dropped,
positional-arg swap fixed).

The downloader sits behind a source interface: tests use a deterministic
synthetic source; a live deployment would plug an HTTP source running in
``foreachPartition`` tasks with redirect-following chunked streaming and
``coalesce(4)`` honoring the reference's 4-connection quota
(imagery_store.py:134-147, README.md:66). No network access exists in
this environment, so the HTTP source raises NotImplementedError.
"""

from __future__ import annotations

from typing import Protocol

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_sentinel_imagery_spark.operators.raster import (
    SINGLE_BAND_SCHEMA,
    clip_stacks,
    normalize_pixels_col,
    reproject_stacks,
    stack_bands,
)
from etl_sentinel_imagery_spark.operators.selection import (
    best_product_direct,
    filter_products,
    with_coverage_ratio,
)


class BandSource(Protocol):
    """Provides single-band rasters for (product, band) pairs."""

    def fetch(self, spark: SparkSession, products: DataFrame, bands: list[str]) -> DataFrame:
        """Return a DataFrame with SINGLE_BAND_SCHEMA rows."""
        ...


class SyntheticBandSource:
    """Deterministic in-memory band source for tests: pixel values are a
    (product, band, row, col)-keyed integer pattern in the reflectance
    range, so golden outputs are reproducible without I/O."""

    def __init__(self, height: int = 8, width: int = 8, crs: str = "epsg:32631"):
        self.height, self.width, self.crs = height, width, crs

    def fetch(self, spark: SparkSession, products: DataFrame, bands: list[str]) -> DataFrame:
        rows = []
        for i, p in enumerate(sorted(r["uuid"] for r in products.select("uuid").collect())):
            for bi, band in enumerate(sorted(bands)):
                base = (i * 37 + bi * 11) % 90
                pixels = [
                    [((base + r * 13 + c * 7) * 157) % 15000 for c in range(self.width)]
                    for r in range(self.height)
                ]
                transform = {
                    "a": 10.0, "b": 0.0, "c": 600000.0 + i * 40.0,
                    "d": 0.0, "e": -10.0, "f": 4800000.0,
                }
                rows.append((p, band, self.height, self.width, pixels, transform, self.crs, 0))
        return spark.createDataFrame(rows, schema=SINGLE_BAND_SCHEMA)


class HttpBandSource:
    """Live downloader (imagery_store.py:92-147 semantics): per-band
    chunked streaming HTTP with redirect-following and 401→token-refresh
    retry inside executor tasks, coalesced to the 4-connection quota.
    Fully implemented in sources.http_bands and exercised against a
    local fake server (tests/test_http_bands.py); this wrapper binds the
    engine's URL scheme + token endpoint. Needs network (or a local
    server) at fetch time."""

    def __init__(self, base_url: str, token_url: str):
        self.base_url, self.token_url = base_url, token_url

    def fetch(self, spark: SparkSession, products: DataFrame, bands: list[str]) -> DataFrame:
        import functools

        from etl_sentinel_imagery_spark.sources.http_bands import (
            fetch_bands_http,
            make_token_manager,
            simple_band_url,
        )

        return fetch_bands_http(
            spark,
            products,
            bands,
            url_for=functools.partial(simple_band_url, self.base_url),
            token_manager_factory=functools.partial(
                make_token_manager, self.token_url
            ),
        )


def select_product(
    catalog: DataFrame,
    aoi_bbox: tuple[float, float, float, float],
    params: dict,
    bands: list[str],
    tile_id: str | None = None,
) -> DataFrame:
    """Stage b (imagery_store.py:205-273): filters → coverage → top-1.

    The by-AOI path applies the spatial Intersects predicate (P7,
    imagery_store.py:185) — products disjoint from the AOI never reach
    ranking, so an off-catalog AOI yields an empty selection rather than
    a zero-coverage 'winner'."""
    filtered = filter_products(
        catalog,
        params["platform"],
        params["product_type"],
        params["date_start"],
        params["date_end"],
        params["cloud_max"],
        tile_id=tile_id,
    )
    with_ratio = with_coverage_ratio(filtered, aoi_bbox).filter(
        F.col("area_ratio") > 0.0
    )
    # top-1 via TakeOrderedAndProject — no full ranking materialized
    return best_product_direct(with_ratio, bands)


def etl_process_tile(
    band_rasters: DataFrame, normalize: bool = True, reproject_4326: bool = False
) -> DataFrame:
    """R6 (tx.py:110-120, intended semantics): stack(+normalize when
    UINT8) → optional reproject. Normalize runs BEFORE the grouped stack
    so it stays JVM-side column arithmetic on the narrow per-band rows."""
    df = band_rasters
    if normalize:
        df = df.withColumn("pixels", normalize_pixels_col("pixels"))
    stacked = stack_bands(df)
    if reproject_4326:
        stacked = reproject_stacks(stacked, "epsg:4326")
    return stacked


def etl_process_by_polygon(
    band_rasters: DataFrame,
    clip_bbox: tuple[float, float, float, float],
    normalize: bool = True,
    reproject_4326: bool = False,
) -> DataFrame:
    """R7 (tx.py:123-138, redundant double-stack dropped): stack → clip →
    optional reproject."""
    df = band_rasters
    if normalize:
        df = df.withColumn("pixels", normalize_pixels_col("pixels"))
    stacked = clip_stacks(stack_bands(df), clip_bbox)
    if reproject_4326:
        stacked = reproject_stacks(stacked, "epsg:4326")
    return stacked


def write_cache(stacked: DataFrame, cache_dir: str) -> None:
    """S9 (tx.py:92-96, dataset.py:54): idempotent uuid-keyed cache sink.

    Parquet partitioned by product_id with dynamic partition overwrite —
    re-running a product replaces exactly its own partition (the Spark
    analogue of overwriting `{uuid}.tif`)."""
    (
        stacked.withColumnRenamed("product_id", "uuid")
        .write.mode("overwrite")
        .partitionBy("uuid")
        .option("partitionOverwriteMode", "dynamic")
        .parquet(cache_dir)
    )


def acquire(
    spark: SparkSession,
    catalog: DataFrame,
    aoi_bbox: tuple[float, float, float, float],
    params: dict,
    bands: list[str],
    source: BandSource,
    cache_dir: str | None = None,
    clip_bbox: tuple[float, float, float, float] | None = None,
    normalize: bool = True,
    reproject_4326: bool = False,
    cache_format: str = "parquet",
) -> DataFrame:
    """Entry point 2 analog (dataset.py:35-59): the full per-AOI pipeline.

    ``clip_bbox`` must be expressed in the RASTER's CRS (the reference
    reprojects the AOI into the product CRS before masking). Early
    bail-out (P11, imagery_store.py:59): empty selection short-circuits
    before any fetch work is scheduled."""
    product = select_product(catalog, aoi_bbox, params, bands)
    if product.isEmpty():
        return product
    rasters = source.fetch(spark, product, bands)
    if clip_bbox is not None:
        stacked = etl_process_by_polygon(
            rasters, clip_bbox, normalize=normalize, reproject_4326=reproject_4326
        )
    else:
        stacked = etl_process_tile(
            rasters, normalize=normalize, reproject_4326=reproject_4326
        )
    if cache_dir is not None:
        if cache_format == "geotiff":
            # the reference's {uuid}.tif cache (dataset.py:54) as bytes
            from etl_sentinel_imagery_spark.operators.raster_io import (
                write_cache_geotiff,
            )

            write_cache_geotiff(
                stacked, cache_dir, dtype="uint8" if normalize else "int32"
            )
        else:
            write_cache(stacked, cache_dir)
    return stacked
