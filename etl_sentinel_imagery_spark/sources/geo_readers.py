"""AOI file readers — the reference's S1/S2 sources, Spark-first.

`read_file_as_gdf` (`/root/reference/code/download_imagery.py:16-30`)
reads CSV-with-WKT or GeoJSON/GPKG/SHP into a GeoDataFrame. Here: the CSV
path is a real distributed ``spark.read.csv`` (and the reference's latent
missing-return bug on that branch — SURVEY.md §2.1 S1 — is fixed by
construction); the GeoJSON path parses the FeatureCollection driver-side
(AOI files are small control-plane inputs) and emits a DataFrame. Both
produce the same schema: fid, tile_id, geometry (WKT) + a bbox struct for
the bbox fast paths.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_sentinel_imagery_spark.operators.selection import wkt_bbox

AOI_SCHEMA = "fid bigint, tile_id string, geometry string"


def _with_bbox(df: DataFrame) -> DataFrame:
    bb = wkt_bbox(F.col("geometry"))
    return df.withColumn(
        "bbox",
        F.struct(
            bb["minx"].alias("minx"),
            bb["miny"].alias("miny"),
            bb["maxx"].alias("maxx"),
            bb["maxy"].alias("maxy"),
        ),
    )


def read_aoi_csv(spark: SparkSession, path: str) -> DataFrame:
    """CSV with a WKT `geometry` column (download_imagery.py:17-21
    intended semantics — the reference's CSV branch never returned)."""
    raw = spark.read.option("header", True).csv(path)
    cols = [
        # fid stays BIGINT: monotonically_increasing_id packs the
        # partition id into bits >= 33, so an int cast would collide ids
        # across partitions and silently merge distinct AOIs downstream.
        F.col("fid").cast("bigint").alias("fid")
        if "fid" in raw.columns
        else F.monotonically_increasing_id().alias("fid"),
        F.col("tile_id").alias("tile_id")
        if "tile_id" in raw.columns
        else F.lit(None).cast("string").alias("tile_id"),
        F.col("geometry"),
    ]
    return _with_bbox(raw.select(*cols))


def _geojson_geom_to_wkt(geom: dict) -> str:
    """Polygon/MultiPolygon GeoJSON geometry → WKT (outer rings only for
    the AOI use case)."""
    t = geom["type"]
    if t == "Polygon":
        rings = geom["coordinates"]
        inner = ", ".join(f"{x:g} {y:g}" for x, y in rings[0])
        return f"POLYGON (({inner}))"
    if t == "MultiPolygon":
        parts = []
        for poly in geom["coordinates"]:
            inner = ", ".join(f"{x:g} {y:g}" for x, y in poly[0])
            parts.append(f"(({inner}))")
        return "MULTIPOLYGON (" + ", ".join(parts) + ")"
    raise ValueError(f"unsupported GeoJSON geometry type {t}")


def read_aoi_geojson(spark: SparkSession, path: str) -> DataFrame:
    """GeoJSON FeatureCollection → (fid, tile_id, geometry WKT, bbox).

    Driver-side parse: AOI descriptors are tiny (the reference's sample
    is one feature); the distributed path for huge feature sets would be
    spark.read.json + explode(features)."""
    with open(path) as fh:
        fc = json.load(fh)
    rows = []
    for i, feat in enumerate(fc.get("features", [])):
        props = feat.get("properties") or {}
        rows.append(
            (
                int(props.get("fid", i)),
                props.get("tile_id"),
                _geojson_geom_to_wkt(feat["geometry"]),
            )
        )
    return _with_bbox(spark.createDataFrame(rows, schema=AOI_SCHEMA))
