"""AOI reader tests — S1/S2 sources (download_imagery.py:16-30 parity,
with the CSV branch's missing-return bug fixed)."""

from __future__ import annotations

import json

from etl_sentinel_imagery_spark.sources.geo_readers import (
    read_aoi_csv,
    read_aoi_geojson,
)

TOULOUSE_WKT = (
    "POLYGON ((1.2047 43.3882, 1.5121 43.3882, 1.5121 43.662, "
    "1.2047 43.662, 1.2047 43.3882))"
)


def test_read_aoi_csv(spark, tmp_path):
    p = tmp_path / "aoi.csv"
    p.write_text(
        'fid,tile_id,geometry\n1,31TCJ,"%s"\n2,,"POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))"\n'
        % TOULOUSE_WKT
    )
    df = read_aoi_csv(spark, str(p))
    rows = {r["fid"]: r for r in df.collect()}
    assert rows[1]["tile_id"] == "31TCJ"
    assert rows[1]["geometry"] == TOULOUSE_WKT
    bb = rows[1]["bbox"]
    assert (bb["minx"], bb["miny"], bb["maxx"], bb["maxy"]) == (
        1.2047, 43.3882, 1.5121, 43.662,
    )
    assert rows[2]["bbox"]["maxx"] == 1.0


def test_read_aoi_geojson(spark, tmp_path):
    # the reference's sample fixture shape (data/toulouse_bbox_wgs84.geojson)
    fc = {
        "type": "FeatureCollection",
        "features": [
            {
                "type": "Feature",
                "properties": {"fid": 7, "tile_id": "31TCJ"},
                "geometry": {
                    "type": "Polygon",
                    "coordinates": [
                        [
                            [1.2047, 43.3882],
                            [1.5121, 43.3882],
                            [1.5121, 43.662],
                            [1.2047, 43.662],
                            [1.2047, 43.3882],
                        ]
                    ],
                },
            }
        ],
    }
    p = tmp_path / "aoi.geojson"
    p.write_text(json.dumps(fc))
    df = read_aoi_geojson(spark, str(p))
    row = df.collect()[0]
    assert row["fid"] == 7
    assert row["geometry"].startswith("POLYGON ((1.2047 43.3882")
    assert row["bbox"]["miny"] == 43.3882


def _wkb_polygon(coords: list[tuple[float, float]]) -> bytes:
    """Little-endian WKB Polygon with a single ring (test fixture side —
    independent encoder, exercising the reader's parser)."""
    import struct

    buf = struct.pack("<BII", 1, 3, 1) + struct.pack("<I", len(coords))
    for x, y in coords:
        buf += struct.pack("<dd", x, y)
    return buf


RING = [(1.25, 43.25), (1.75, 43.25), (1.75, 43.75), (1.25, 43.75), (1.25, 43.25)]


def test_read_aoi_gpkg(spark, tmp_path):
    """Hand-built GeoPackage: SQLite + gpkg_contents/gpkg_geometry_columns
    + a feature table whose geometry is a GP-header + WKB blob."""
    import sqlite3
    import struct

    from etl_sentinel_imagery_spark.sources.geo_readers import read_aoi_gpkg

    path = str(tmp_path / "aoi.gpkg")
    con = sqlite3.connect(path)
    con.execute(
        "CREATE TABLE gpkg_contents (table_name TEXT, data_type TEXT)"
    )
    con.execute(
        "CREATE TABLE gpkg_geometry_columns (table_name TEXT, column_name TEXT)"
    )
    con.execute(
        "CREATE TABLE aoi (fid INTEGER PRIMARY KEY, tile_id TEXT, geom BLOB)"
    )
    con.execute("INSERT INTO gpkg_contents VALUES ('aoi', 'features')")
    con.execute("INSERT INTO gpkg_geometry_columns VALUES ('aoi', 'geom')")
    # GP header: magic, version 0, flags bit1-3=1 → 32-byte XY envelope
    header = b"GP" + bytes([0, 0b10]) + struct.pack("<i", 4326)
    envelope = struct.pack("<4d", 1.25, 1.75, 43.25, 43.75)
    blob = header + envelope + _wkb_polygon(RING)
    con.execute("INSERT INTO aoi VALUES (3, '31TCJ', ?)", (blob,))
    con.commit()
    con.close()

    row = read_aoi_gpkg(spark, path).collect()[0]
    assert row["fid"] == 3 and row["tile_id"] == "31TCJ"
    assert row["geometry"] == (
        "POLYGON ((1.25 43.25, 1.75 43.25, 1.75 43.75, 1.25 43.75, 1.25 43.25))"
    )
    assert row["bbox"]["maxx"] == 1.75


def test_read_aoi_shp_with_dbf(spark, tmp_path):
    """Hand-built shapefile record (type 5 polygon) + dBase III .dbf."""
    import struct

    from etl_sentinel_imagery_spark.sources.geo_readers import read_aoi_shp

    # --- .shp: 100-byte header + one polygon record
    n_pts = len(RING)
    content = struct.pack("<I", 5)  # shape type
    content += struct.pack("<4d", 1.25, 43.25, 1.75, 43.75)  # bbox
    content += struct.pack("<II", 1, n_pts)  # numparts, numpoints
    content += struct.pack("<I", 0)  # part offsets
    for x, y in RING:
        content += struct.pack("<dd", x, y)
    content_words = len(content) // 2
    rec = struct.pack(">II", 1, content_words) + content
    file_words = (100 + len(rec)) // 2
    header = struct.pack(">I", 9994) + b"\x00" * 20 + struct.pack(">I", file_words)
    header += struct.pack("<II", 1000, 5)  # version, shape type
    header += struct.pack("<8d", 1.25, 43.25, 1.75, 43.75, 0, 0, 0, 0)
    shp_path = tmp_path / "aoi.shp"
    shp_path.write_bytes(header + rec)

    # --- .dbf: fields fid (N), tile_id (C)
    fid_field = b"fid".ljust(11, b"\x00") + b"N" + b"\x00" * 4 + bytes([8]) + b"\x00" * 15
    tile_field = (
        b"tile_id".ljust(11, b"\x00") + b"C" + b"\x00" * 4 + bytes([8]) + b"\x00" * 15
    )
    dbf_header = struct.pack(
        "<BBBBIHH", 3, 24, 1, 1, 1, 32 + 64 + 1, 1 + 8 + 8
    ) + b"\x00" * 20
    record = b" " + b"       9" + b"31TCJ   "
    (tmp_path / "aoi.dbf").write_bytes(
        dbf_header + fid_field + tile_field + b"\x0d" + record
    )

    row = read_aoi_shp(spark, str(shp_path)).collect()[0]
    assert row["fid"] == 9 and row["tile_id"] == "31TCJ"
    assert row["geometry"] == (
        "POLYGON ((1.25 43.25, 1.75 43.25, 1.75 43.75, 1.25 43.75, 1.25 43.25))"
    )


def test_read_aoi_shp_without_dbf(spark, tmp_path):
    """No sibling .dbf → fid falls back to 0-based record number."""
    import struct

    from etl_sentinel_imagery_spark.sources.geo_readers import read_aoi_shp

    content = struct.pack("<I", 5)
    content += struct.pack("<4d", 0, 0, 1, 1)
    content += struct.pack("<II", 1, 4)
    content += struct.pack("<I", 0)
    for x, y in [(0, 0), (1, 0), (1, 1), (0, 0)]:
        content += struct.pack("<dd", float(x), float(y))
    rec = struct.pack(">II", 1, len(content) // 2) + content
    header = struct.pack(">I", 9994) + b"\x00" * 20
    header += struct.pack(">I", (100 + len(rec)) // 2)
    header += struct.pack("<II", 1000, 5) + struct.pack("<8d", 0, 0, 1, 1, 0, 0, 0, 0)
    p = tmp_path / "bare.shp"
    p.write_bytes(header + rec)
    row = read_aoi_shp(spark, str(p)).collect()[0]
    assert row["fid"] == 0 and row["tile_id"] is None
    assert row["geometry"].startswith("POLYGON ((0 0")


def _wkb_polygon_rings(rings: list[list[tuple[float, float]]]) -> bytes:
    import struct

    buf = struct.pack("<BII", 1, 3, len(rings))
    for ring in rings:
        buf += struct.pack("<I", len(ring))
        for x, y in ring:
            buf += struct.pack("<dd", x, y)
    return buf


def test_geojson_and_wkb_preserve_holes(spark, tmp_path):
    """Interior rings survive both readers and feed the signed-ring
    overlay: a donut AOI's area excludes the hole."""
    import json

    from etl_sentinel_imagery_spark.functions.geometry import (
        parse_wkt_signed_rings,
        shoelace_area,
    )
    from etl_sentinel_imagery_spark.sources.geo_readers import _wkb_to_wkt

    outer = [(0, 0), (10, 0), (10, 10), (0, 10), (0, 0)]
    hole = [(3, 3), (3, 7), (7, 7), (7, 3), (3, 3)]
    gj = {
        "type": "FeatureCollection",
        "features": [
            {
                "type": "Feature",
                "properties": {"fid": 1},
                "geometry": {
                    "type": "Polygon",
                    "coordinates": [outer, hole],
                },
            }
        ],
    }
    p = tmp_path / "donut.geojson"
    p.write_text(json.dumps(gj))
    row = read_aoi_geojson(spark, str(p)).collect()[0]
    signed = parse_wkt_signed_rings(row["geometry"])
    assert [s for _, s in signed] == [1, -1]
    assert abs(sum(s * shoelace_area(r) for r, s in signed) - 84.0) < 1e-12

    wkt = _wkb_to_wkt(_wkb_polygon_rings([outer, hole]))
    signed = parse_wkt_signed_rings(wkt)
    assert [s for _, s in signed] == [1, -1]
    assert abs(sum(s * shoelace_area(r) for r, s in signed) - 84.0) < 1e-12


def test_shp_hole_attached_to_outer(spark, tmp_path):
    """A CCW (hole) part lands as an interior ring of the CW outer that
    contains it."""
    import struct

    from etl_sentinel_imagery_spark.functions.geometry import (
        parse_wkt_signed_rings,
        shoelace_area,
    )
    from etl_sentinel_imagery_spark.sources.geo_readers import read_aoi_shp

    outer = [(0, 0), (0, 10), (10, 10), (10, 0), (0, 0)]  # CW (shp outer)
    hole = [(3, 3), (7, 3), (7, 7), (3, 7), (3, 3)]  # CCW (shp hole)
    pts = outer + hole
    content = struct.pack("<I", 5)
    content += struct.pack("<4d", 0, 0, 10, 10)
    content += struct.pack("<II", 2, len(pts))
    content += struct.pack("<II", 0, len(outer))
    for x, y in pts:
        content += struct.pack("<dd", x, y)
    rec = struct.pack(">II", 1, len(content) // 2) + content
    header = struct.pack(">I", 9994) + b"\x00" * 20
    header += struct.pack(">I", (100 + len(rec)) // 2)
    header += struct.pack("<II", 1000, 5)
    header += struct.pack("<8d", 0, 0, 10, 10, 0, 0, 0, 0)
    p = tmp_path / "donut.shp"
    p.write_bytes(header + rec)

    row = read_aoi_shp(spark, str(p)).collect()[0]
    signed = parse_wkt_signed_rings(row["geometry"])
    assert [s for _, s in signed] == [1, -1]
    assert abs(sum(s * shoelace_area(r) for r, s in signed) - 84.0) < 1e-12
