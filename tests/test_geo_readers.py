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
