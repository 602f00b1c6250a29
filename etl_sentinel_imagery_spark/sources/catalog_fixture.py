"""Deterministic Sentinel catalog / AOI / band-manifest fixtures.

The reference's domain tables (FIXTURES.md §1-§4): the OData product
catalog (`/root/reference/code/imagery_store.py:223-243`), the AOI row
(`dataset.py:36-40`), and the per-product band-file manifest extracted
from MTD_MSIL2A.xml (`imagery_store.py:110-132`).

One python constant is the single source of truth, rendered two ways:
``catalog_df(spark)`` for the engine and ``*_values_sql()`` as a DuckDB
VALUES clause for the oracle — so the selection pipeline is fully
hash-checkable even though the driver materializes no catalog table.

All coordinates sit on a 0.25° grid: every coordinate, intersection
width, and area is exactly representable in binary floating point, so
coverage ratios are bit-identical across engines by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# --- AOI (Toulouse-bbox analog; data/toulouse_bbox_wgs84.geojson) --------
AOI = {
    "fid": 1,
    "tile_id": "31TCJ",
    "minx": 1.25,
    "miny": 43.25,
    "maxx": 1.75,
    "maxy": 43.75,
}


def _bbox_wkt(minx: float, miny: float, maxx: float, maxy: float) -> str:
    return (
        f"POLYGON (({minx} {miny}, {maxx} {miny}, {maxx} {maxy}, "
        f"{minx} {maxy}, {minx} {miny}))"
    )


AOI_WKT = _bbox_wkt(AOI["minx"], AOI["miny"], AOI["maxx"], AOI["maxy"])


def _name(platform: str, ptype: str, date: str, time: str, orbit: str, tile: str) -> str:
    """Product name in the reference's 7-field shape (imagery_store.py:119-128):
    {platform}_{type}_{YYYYMMDD}T{hhmmss}_{proc}_R{orbit}_T{tile}_{ts}."""
    d = date.replace("-", "")
    return f"{platform}_{ptype}_{d}T{time}_N0509_{orbit}_T{tile}_{d}T170400"


# Catalog rows. Coverage fractions of the 0.5°×0.5° AOI:
#   p-full   : whole tile 1..2 × 43..44          → ratio 1.0
#   p-east   : 1.5..2.5 × 43..44                 → 0.25×0.5/0.25 = 0.5
#   p-south  : 1..2 × 42.75..43.5                → 0.5×0.25/0.25 = 0.5  (tie w/ p-east, later OriginDate wins)
#   p-corner : 1.5..2.0 × 43.5..44.0             → 0.25×0.25/0.25 = 0.25
#   p-miss   : 2.0..3.0 × 43..44 (tile 31TDJ)    → 0 overlap
# plus one row failing each individual filter.
CATALOG_ROWS = [
    # id, date, time, orbit, tile, cloud, platform, ptype, bbox
    ("p-full", "2023-06-12", "104621", "R051", "31TCJ", 2.7, "SENTINEL-2", "S2MSI2A", (1.0, 43.0, 2.0, 44.0)),
    ("p-east", "2023-06-17", "104621", "R051", "31TCJ", 1.1, "SENTINEL-2", "S2MSI2A", (1.5, 43.0, 2.5, 44.0)),
    ("p-south", "2023-06-22", "104621", "R051", "31TCJ", 0.9, "SENTINEL-2", "S2MSI2A", (1.0, 42.75, 2.0, 43.5)),
    ("p-corner", "2023-07-02", "104621", "R008", "31TCJ", 3.9, "SENTINEL-2", "S2MSI2A", (1.5, 43.5, 2.0, 44.0)),
    ("p-miss", "2023-06-12", "104621", "R051", "31TDJ", 1.5, "SENTINEL-2", "S2MSI2A", (2.0, 43.0, 3.0, 44.0)),
    ("p-cloudy", "2023-06-27", "104621", "R051", "31TCJ", 80.0, "SENTINEL-2", "S2MSI2A", (1.0, 43.0, 2.0, 44.0)),
    ("p-early", "2023-04-02", "104621", "R051", "31TCJ", 1.0, "SENTINEL-2", "S2MSI2A", (1.0, 43.0, 2.0, 44.0)),
    ("p-late", "2023-10-07", "104621", "R051", "31TCJ", 1.0, "SENTINEL-2", "S2MSI2A", (1.0, 43.0, 2.0, 44.0)),
    ("p-l1c", "2023-06-12", "104621", "R051", "31TCJ", 2.0, "SENTINEL-2", "S2MSI1C", (1.0, 43.0, 2.0, 44.0)),
    ("p-s1", "2023-06-12", "104621", "R051", "31TCJ", 0.0, "SENTINEL-1", "GRD", (1.0, 43.0, 2.0, 44.0)),
    # second tile, in-range rows (exercise tileId filter + multi-tile catalog)
    ("p-tdj-1", "2023-06-12", "105621", "R051", "31TDJ", 2.2, "SENTINEL-2", "S2MSI2A", (2.0, 43.0, 3.0, 44.0)),
    ("p-tdj-2", "2023-07-12", "105621", "R008", "31TDJ", 3.0, "SENTINEL-2", "S2MSI2A", (2.0, 43.0, 3.0, 44.0)),
]

#: Default query parameters (conf/config.yaml:24-32 analog).
SELECT_PARAMS = {
    "platform": "SENTINEL-2",
    "product_type": "S2MSI2A",
    "date_start": "2023-05-01",
    "date_end": "2023-09-05",
    "cloud_max": 4.0,
}

CATALOG_COLUMNS = [
    "Id",
    "Name",
    "S3Path",
    "OriginDate",
    "ContentDate_Start",
    "GeoFootprint",
    "Footprint",
    "platform",
    "productType",
    "tileId",
    "cloudCover",
    "relativeOrbitNumber",
]

_CATALOG_SCHEMA = (
    "Id string, Name string, S3Path string, OriginDate string, "
    "ContentDate_Start string, GeoFootprint string, Footprint string, "
    "platform string, productType string, tileId string, cloudCover double, "
    "relativeOrbitNumber string, "
    "Attributes array<struct<Name:string, Value:string>>"
)


def _row_tuple(row):
    pid, date, time, orbit, tile, cloud, platform, ptype, bbox = row
    name = _name(platform, ptype, date, time, orbit, tile)
    wkt = _bbox_wkt(*bbox)
    return (
        pid,
        name,
        f"/eodata/Sentinel-2/MSI/L2A/{date[:4]}/{date[5:7]}/{date[8:10]}/{name}.SAFE",
        f"{date}T{time[:2]}:{time[2:4]}:{time[4:6]}.000Z",
        f"{date}T{time[:2]}:{time[2:4]}:{time[4:6]}Z",
        wkt,
        f"geography'SRID=4326;{wkt}'",
        platform,
        ptype,
        tile,
        cloud,
        orbit,
        [
            {"Name": "productType", "Value": ptype},
            {"Name": "tileId", "Value": tile},
            {"Name": "cloudCover", "Value": str(cloud)},
        ],
    )


def catalog_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        [_row_tuple(r) for r in CATALOG_ROWS], schema=_CATALOG_SCHEMA
    )


def _sql_str(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def catalog_values_sql() -> str:
    """The same catalog as a DuckDB VALUES relation (incl. numeric bbox
    columns so the oracle never parses WKT)."""
    rows = []
    for row in CATALOG_ROWS:
        t = _row_tuple(row)
        pid, name, s3, origin, cds, wkt, foot, platform, ptype, tile, cloud, orbit, attrs = t
        minx, miny, maxx, maxy = row[8]
        attr_sql = (
            "["
            + ", ".join(
                f"{{'Name': {_sql_str(a['Name'])}, 'Value': {_sql_str(a['Value'])}}}"
                for a in attrs
            )
            + "]"
        )
        rows.append(
            f"({_sql_str(pid)}, {_sql_str(name)}, {_sql_str(s3)}, {_sql_str(origin)}, "
            f"{_sql_str(cds)}, {_sql_str(wkt)}, {_sql_str(foot)}, {_sql_str(platform)}, "
            f"{_sql_str(ptype)}, {_sql_str(tile)}, {cloud!r}, {_sql_str(orbit)}, "
            f"{attr_sql}, {minx!r}, {miny!r}, {maxx!r}, {maxy!r})"
        )
    cols = ", ".join(CATALOG_COLUMNS + ["Attributes", "minx", "miny", "maxx", "maxy"])
    return "(VALUES " + ",\n ".join(rows) + f") AS catalog({cols})"


# --- band-file manifest (MTD_MSIL2A.xml IMAGE_FILE table) -----------------
BAND_FILE_ROWS = [
    (pid, band, res)
    for pid in ("p-full", "p-east", "p-south")
    for band, res in (
        ("B02", 10), ("B03", 10), ("B04", 10), ("B08", 10),
        ("B05", 20), ("B11", 20), ("B01", 60), ("TCI", 10),
    )
]


def _image_file(pid: str, band: str, res: int) -> str:
    tile, date = "31TCJ", "20230612T104621"
    return (
        f"GRANULE/L2A_T{tile}_A041548_{date}/IMG_DATA/R{res}m/"
        f"T{tile}_{date}_{band}_{res}m"
    )


def bands_df(spark: SparkSession) -> DataFrame:
    rows = [
        (pid, _image_file(pid, band, res), band, res)
        for pid, band, res in BAND_FILE_ROWS
    ]
    return spark.createDataFrame(
        rows, schema="product_id string, image_file string, band string, resolution_m int"
    )


def bands_values_sql() -> str:
    rows = ",\n ".join(
        f"({_sql_str(pid)}, {_sql_str(_image_file(pid, band, res))}, "
        f"{_sql_str(band)}, {res})"
        for pid, band, res in BAND_FILE_ROWS
    )
    return f"(VALUES {rows}) AS bands(product_id, image_file, band, resolution_m)"


# --- MTD_MSIL2A.xml documents (the S5 XML metadata source) ----------------
_XML_META = {  # per product: cloud coverage, orbit direction, nodata index
    "p-full": (2.7, "DESCENDING", 0),
    "p-east": (1.1, "DESCENDING", 0),
    "p-south": (0.9, "ASCENDING", 0),
}


def mtd_xml(pid: str) -> str:
    """A miniature MTD_MSIL2A.xml in the shape the reference parses
    (imagery_store.py:110-132): IMAGE_FILE entries + scalar assessments."""
    cloud, orbit, nodata = _XML_META[pid]
    files = "\n    ".join(
        f"<IMAGE_FILE>{_image_file(pid, band, res)}</IMAGE_FILE>"
        for p2, band, res in BAND_FILE_ROWS
        if p2 == pid
    )
    return f"""<n1:Level-2A_User_Product>
  <Product_Organisation>
    {files}
  </Product_Organisation>
  <Cloud_Coverage_Assessment>{cloud}</Cloud_Coverage_Assessment>
  <SENSING_ORBIT_DIRECTION>{orbit}</SENSING_ORBIT_DIRECTION>
  <SPECIAL_VALUE_INDEX>{nodata}</SPECIAL_VALUE_INDEX>
</n1:Level-2A_User_Product>"""


def mtd_xml_df(spark: SparkSession) -> DataFrame:
    rows = [(pid, mtd_xml(pid)) for pid in sorted(_XML_META)]
    return spark.createDataFrame(rows, schema="product_id string, xml string")


def mtd_xml_values_sql() -> str:
    rows = ",\n ".join(
        f"({_sql_str(pid)}, {_sql_str(mtd_xml(pid))})" for pid in sorted(_XML_META)
    )
    return f"(VALUES {rows}) AS mtd(product_id, xml)"
