"""Sentinel-domain query battery — the reference's own pipeline, oracled.

These queries run on the embedded deterministic catalog fixture (the
driver materializes no catalog table), and their oracles embed the SAME
fixture as a DuckDB VALUES relation — so the reference's actual selection
semantics (SURVEY.md §2.2-2.6, §3.2) are hash-checked end-to-end, not
just rows-counted. The numeric bbox columns ride along in the VALUES so
the oracle never parses WKT; the Spark side parses the WKT footprints
(F6/F7) and must land on identical doubles (0.25°-grid coordinates are
exact in binary FP).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_sentinel_imagery_spark.operators.selection import (
    best_product_direct,
    filter_products,
    rank_by_coverage,
    with_coverage_ratio,
)
from etl_sentinel_imagery_spark.queries.base import Q
from etl_sentinel_imagery_spark.sources.catalog_fixture import (
    AOI,
    SELECT_PARAMS,
    bands_df,
    bands_values_sql,
    catalog_df,
    catalog_values_sql,
)

_AOI_BBOX = (AOI["minx"], AOI["miny"], AOI["maxx"], AOI["maxy"])
_AOI_AREA = (AOI["maxx"] - AOI["minx"]) * (AOI["maxy"] - AOI["miny"])
_BANDS = ["B02", "B03", "B04", "B08"]

_FILTER_SQL = f"""
    platform = '{SELECT_PARAMS["platform"]}'
    AND productType = '{SELECT_PARAMS["product_type"]}'
    AND ContentDate_Start > '{SELECT_PARAMS["date_start"]}'
    AND ContentDate_Start < '{SELECT_PARAMS["date_end"]}'
    AND cloudCover <= {SELECT_PARAMS["cloud_max"]}
"""

_RATIO_SQL = f"""
    greatest(least(maxx, {AOI['maxx']!r}) - greatest(minx, {AOI['minx']!r}), 0.0)
    * greatest(least(maxy, {AOI['maxy']!r}) - greatest(miny, {AOI['miny']!r}), 0.0)
    / {_AOI_AREA!r}
"""

_RANKED_CTE = f"""
ranked AS (
    SELECT Id, Name, S3Path, OriginDate, tileId, cloudCover,
           relativeOrbitNumber, area_ratio,
           ROW_NUMBER() OVER (
               ORDER BY area_ratio DESC, OriginDate DESC, Id ASC) AS rank
    FROM (
        SELECT Id, Name, S3Path, OriginDate, tileId, cloudCover,
               relativeOrbitNumber, SUM(area_ratio) AS area_ratio
        FROM (
            SELECT *, {_RATIO_SQL} AS area_ratio
            FROM {catalog_values_sql()}
            WHERE {_FILTER_SQL}
        )
        GROUP BY 1, 2, 3, 4, 5, 6, 7
    )
)
"""


def _ranked(spark: SparkSession) -> DataFrame:
    cat = filter_products(
        catalog_df(spark),
        SELECT_PARAMS["platform"],
        SELECT_PARAMS["product_type"],
        SELECT_PARAMS["date_start"],
        SELECT_PARAMS["date_end"],
        SELECT_PARAMS["cloud_max"],
    )
    return rank_by_coverage(with_coverage_ratio(cat, _AOI_BBOX))


def _coverage_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _ranked(spark).select(
        F.col("Id").alias("product_id"),
        F.col("tileId").alias("tile"),
        "area_ratio",
        "rank",
        F.col("OriginDate").alias("origin_date"),
    )


_COVERAGE_RANKING_SQL = f"""
WITH {_RANKED_CTE}
SELECT Id AS product_id, tileId AS tile, area_ratio, rank,
       OriginDate AS origin_date
FROM ranked
"""


def _select_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    # top-1 via TakeOrderedAndProject (best_product_direct) — no global
    # ranking window. bands is emitted as a joined string: array cells
    # are not canonicalizable by the driver's value hasher.
    cat = filter_products(
        catalog_df(spark),
        SELECT_PARAMS["platform"],
        SELECT_PARAMS["product_type"],
        SELECT_PARAMS["date_start"],
        SELECT_PARAMS["date_end"],
        SELECT_PARAMS["cloud_max"],
    )
    return best_product_direct(with_coverage_ratio(cat, _AOI_BBOX), _BANDS).withColumn(
        "bands", F.concat_ws(",", F.col("bands"))
    )


_SELECT_BEST_SQL = f"""
WITH {_RANKED_CTE}
SELECT Id AS uuid, Name AS name, S3Path AS s3path, tileId AS tile,
       substr(OriginDate, 1, 10) AS product_date,
       cloudCover AS cloudcoverage,
       '{",".join(_BANDS)}' AS bands,
       {len(_BANDS)} AS num_bands,
       relativeOrbitNumber AS orbit,
       area_ratio
FROM ranked WHERE rank = 1
"""


def _attrs_unpack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F13/J2: the reference's Attributes-list→columns promotion
    (imagery_store.py:191-198, 227-235) via map_from_entries — no
    positional concat, the map is computed from the same row."""
    cat = catalog_df(spark)
    m = F.map_from_entries(
        F.transform(
            F.col("Attributes"), lambda a: F.struct(a["Name"], a["Value"])
        )
    )
    return cat.select(
        F.col("Id").alias("product_id"),
        m.getItem("productType").alias("attr_product_type"),
        m.getItem("tileId").alias("attr_tile"),
        m.getItem("cloudCover").cast("double").alias("attr_cloud"),
        F.size("Attributes").alias("n_attrs"),
    )


_ATTRS_UNPACK_SQL = f"""
SELECT Id AS product_id,
       productType AS attr_product_type,
       tileId AS attr_tile,
       cloudCover AS attr_cloud,
       3 AS n_attrs
FROM {catalog_values_sql()}
"""


def _name_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1-F5: product-name field extraction (imagery_store.py:119-128)
    and Footprint SRID/WKT extraction (imagery_store.py:85-86)."""
    cat = catalog_df(spark)
    parts = F.split(F.col("Name"), "_")
    datestr = parts.getItem(2)
    return cat.select(
        F.col("Id").alias("product_id"),
        parts.getItem(0).alias("platform_part"),
        parts.getItem(1).alias("ptype_part"),
        F.concat_ws(
            "-",
            F.substring(datestr, 1, 4),
            F.substring(datestr, 5, 2),
            F.substring(datestr, 7, 2),
        ).alias("sensing_date"),
        parts.getItem(4).alias("orbit_part"),
        F.substring(parts.getItem(5), 2, 10).alias("tile_part"),
        F.regexp_extract(F.col("Footprint"), "SRID=([0-9]+)", 1).alias("srid"),
        F.regexp_extract(F.col("Footprint"), ";(.*)'", 1).alias("footprint_wkt"),
    )


_NAME_PARSE_SQL = f"""
SELECT Id AS product_id,
       string_split(Name, '_')[1] AS platform_part,
       string_split(Name, '_')[2] AS ptype_part,
       concat_ws('-', substr(string_split(Name, '_')[3], 1, 4),
                      substr(string_split(Name, '_')[3], 5, 2),
                      substr(string_split(Name, '_')[3], 7, 2)) AS sensing_date,
       string_split(Name, '_')[5] AS orbit_part,
       substr(string_split(Name, '_')[6], 2, 10) AS tile_part,
       regexp_extract(Footprint, 'SRID=([0-9]+)', 1) AS srid,
       regexp_extract(Footprint, ';(.*)''', 1) AS footprint_wkt
FROM {catalog_values_sql()}
"""


def _band_resolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P10+O4+A2: IMAGE_FILE regex resolve (imagery_store.py:118) for the
    requested bands at 10 m, deterministic band order via array_sort
    (imagery_store.py:67-68), band count (A2)."""
    bands = bands_df(spark)
    pattern = f".*_({'|'.join(_BANDS)})_10m$"
    return (
        bands.filter(F.col("image_file").rlike(pattern))
        .groupBy("product_id")
        .agg(
            F.concat_ws(",", F.array_sort(F.collect_list("band"))).alias("bands"),
            F.concat_ws(",", F.array_sort(F.collect_list("image_file"))).alias(
                "band_files"
            ),
            F.count(F.lit(1)).alias("num_bands"),
        )
    )


_BAND_RESOLVE_SQL = f"""
SELECT product_id,
       array_to_string(list_sort(list(band)), ',') AS bands,
       array_to_string(list_sort(list(image_file)), ',') AS band_files,
       COUNT(*) AS num_bands
FROM {bands_values_sql()}
WHERE regexp_matches(image_file, '.*_({"|".join(_BANDS)})_10m$')
GROUP BY 1
"""


def _coverage_ranking_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME ranking computed through the exact polygon-overlay kernel
    (Sutherland–Hodgman in an Arrow-batched pandas UDF) instead of the
    bbox fast path. On axis-aligned footprints both paths are provably
    equal, so this shares the bbox oracle — hash-matching here proves the
    UDF kernel agrees with the closed-form arithmetic bit-for-bit."""
    from etl_sentinel_imagery_spark.functions.geometry import make_coverage_ratio_udf
    from etl_sentinel_imagery_spark.operators.selection import (
        filter_products,
        rank_by_coverage,
    )
    from etl_sentinel_imagery_spark.sources.catalog_fixture import AOI_WKT

    cat = filter_products(
        catalog_df(spark),
        SELECT_PARAMS["platform"],
        SELECT_PARAMS["product_type"],
        SELECT_PARAMS["date_start"],
        SELECT_PARAMS["date_end"],
        SELECT_PARAMS["cloud_max"],
    )
    ratio_udf = make_coverage_ratio_udf(AOI_WKT)
    with_ratio = cat.withColumn("area_ratio", ratio_udf(F.col("GeoFootprint")))
    return rank_by_coverage(with_ratio).select(
        F.col("Id").alias("product_id"),
        F.col("tileId").alias("tile"),
        "area_ratio",
        "rank",
        F.col("OriginDate").alias("origin_date"),
    )


_MULTI_AOIS = [
    (1, 1.25, 43.25, 1.75, 43.75),
    (2, 2.25, 43.25, 2.75, 43.75),
    (3, 60.0, 10.0, 61.0, 11.0),  # intersects nothing → absent from output
]


def _select_best_multi_aoi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The multi-AOI joined selection (operators.selection.
    select_best_per_aoi) — thousands of AOIs as ONE plan; oracled."""
    from etl_sentinel_imagery_spark.operators.selection import (
        filter_products,
        select_best_per_aoi,
    )

    cat = filter_products(
        catalog_df(spark),
        SELECT_PARAMS["platform"],
        SELECT_PARAMS["product_type"],
        SELECT_PARAMS["date_start"],
        SELECT_PARAMS["date_end"],
        SELECT_PARAMS["cloud_max"],
    )
    aois = spark.createDataFrame(
        _MULTI_AOIS, "fid int, minx double, miny double, maxx double, maxy double"
    ).select(
        "fid",
        F.struct(
            F.col("minx").alias("minx"), F.col("miny").alias("miny"),
            F.col("maxx").alias("maxx"), F.col("maxy").alias("maxy"),
        ).alias("bbox"),
    )
    return select_best_per_aoi(cat, aois)


_AOI_VALUES = ",\n ".join(
    f"({fid}, {minx!r}, {miny!r}, {maxx!r}, {maxy!r})"
    for fid, minx, miny, maxx, maxy in _MULTI_AOIS
)

_MULTI_AOI_SQL = f"""
WITH aois(fid, a_minx, a_miny, a_maxx, a_maxy) AS (VALUES {_AOI_VALUES}),
scored AS (
    SELECT a.fid, catalog.Id, catalog.Name, catalog.OriginDate,
           catalog.tileId, catalog.cloudCover,
           (least(catalog.maxx, a.a_maxx) - greatest(catalog.minx, a.a_minx))
           * (least(catalog.maxy, a.a_maxy) - greatest(catalog.miny, a.a_miny))
           / ((a.a_maxx - a.a_minx) * (a.a_maxy - a.a_miny)) AS area_ratio
    FROM {catalog_values_sql()}
    JOIN aois a
      ON catalog.minx < a.a_maxx AND catalog.maxx > a.a_minx
     AND catalog.miny < a.a_maxy AND catalog.maxy > a.a_miny
    WHERE {_FILTER_SQL}
),
per AS (
    SELECT fid, Id, Name, OriginDate, tileId, cloudCover,
           SUM(area_ratio) AS area_ratio
    FROM scored GROUP BY 1, 2, 3, 4, 5, 6
)
SELECT fid, Id AS uuid, Name AS name, tileId AS tile,
       substr(OriginDate, 1, 10) AS product_date,
       cloudCover AS cloudcoverage, area_ratio
FROM (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY fid
        ORDER BY area_ratio DESC, OriginDate DESC, Id ASC) AS rn
    FROM per
)
WHERE rn = 1
"""


def _xml_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5/F15/A3: MTD_MSIL2A.xml metadata scan (imagery_store.py:110-132)
    — IMAGE_FILE extraction as regexp_extract_all over the node text,
    scalar assessments as first-match extracts, band files filtered to
    the requested bands at 10 m (P10) and sorted (O4)."""
    from etl_sentinel_imagery_spark.sources.catalog_fixture import mtd_xml_df

    xml = mtd_xml_df(spark)
    files = F.expr(r"regexp_extract_all(xml, '<IMAGE_FILE>([^<]+)</IMAGE_FILE>', 1)")
    band_pattern = f".*_({'|'.join(_BANDS)})_10m$"
    return xml.select(
        "product_id",
        F.concat_ws(
            ",", F.array_sort(F.filter(files, lambda f: f.rlike(band_pattern)))
        ).alias("band_files"),
        F.size(files).alias("n_image_files"),
        F.regexp_extract(
            F.col("xml"),
            "<Cloud_Coverage_Assessment>([^<]+)</Cloud_Coverage_Assessment>",
            1,
        )
        .cast("double")
        .alias("cloud_coverage"),
        F.regexp_extract(
            F.col("xml"), "<SENSING_ORBIT_DIRECTION>([^<]+)</SENSING_ORBIT_DIRECTION>", 1
        ).alias("orbit_direction"),
        F.regexp_extract(
            F.col("xml"), "<SPECIAL_VALUE_INDEX>([^<]+)</SPECIAL_VALUE_INDEX>", 1
        )
        .cast("int")
        .alias("nodata_index"),
    )


_XML_SCAN_SQL = f"""
SELECT product_id,
       array_to_string(list_sort(list_filter(
           regexp_extract_all(xml, '<IMAGE_FILE>([^<]+)</IMAGE_FILE>', 1),
           f -> regexp_matches(f, '.*_({"|".join(_BANDS)})_10m$'))), ',')
           AS band_files,
       len(regexp_extract_all(xml, '<IMAGE_FILE>([^<]+)</IMAGE_FILE>', 1))
           AS n_image_files,
       CAST(regexp_extract(xml,
           '<Cloud_Coverage_Assessment>([^<]+)</Cloud_Coverage_Assessment>', 1)
           AS DOUBLE) AS cloud_coverage,
       regexp_extract(xml,
           '<SENSING_ORBIT_DIRECTION>([^<]+)</SENSING_ORBIT_DIRECTION>', 1)
           AS orbit_direction,
       CAST(regexp_extract(xml,
           '<SPECIAL_VALUE_INDEX>([^<]+)</SPECIAL_VALUE_INDEX>', 1) AS INTEGER)
           AS nodata_index
FROM {{MTD_VALUES}}
"""


QUERIES: dict[str, Q] = {
    "sentinel_coverage_ranking": Q(
        _coverage_ranking, _COVERAGE_RANKING_SQL,
        "filters + coverage ratio + group-sum + rank (imagery_store.py:216-259)",
    ),
    "sentinel_select_best": Q(
        _select_best, _SELECT_BEST_SQL,
        "full selection pipeline → product record (imagery_store.py:259-269)",
    ),
    "sentinel_attrs_unpack": Q(
        _attrs_unpack, _ATTRS_UNPACK_SQL, "F13 attribute-list → columns"
    ),
    "sentinel_name_parse": Q(
        _name_parse, _NAME_PARSE_SQL, "F1-F5 name/footprint parsing"
    ),
    "sentinel_band_resolve": Q(
        _band_resolve, _BAND_RESOLVE_SQL, "P10 band regex + O4 sort + A2 count"
    ),
    "sentinel_select_best_multi_aoi": Q(
        _select_best_multi_aoi, _MULTI_AOI_SQL,
        "multi-AOI joined selection (one plan for N AOIs)",
    ),
    "sentinel_coverage_ranking_exact": Q(
        _coverage_ranking_exact, _COVERAGE_RANKING_SQL,
        "J1 exact polygon-overlay coverage (pandas-UDF kernel, same oracle)",
    ),
    "sentinel_xml_scan": Q(
        _xml_scan, None, "S5 XML metadata scan"  # sql filled below
    ),
}


def _finalize_xml_sql() -> None:
    from etl_sentinel_imagery_spark.sources.catalog_fixture import mtd_xml_values_sql

    QUERIES["sentinel_xml_scan"] = Q(
        _xml_scan,
        _XML_SCAN_SQL.replace("{MTD_VALUES}", mtd_xml_values_sql()),
        "S5/F15/A3 XML metadata scan",
    )


_finalize_xml_sql()
