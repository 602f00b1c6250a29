"""Entry-point-1 parity: config → AOI file → acquisition batch."""

from __future__ import annotations

import json

from etl_sentinel_imagery_spark.plans.acquisition import SyntheticBandSource
from etl_sentinel_imagery_spark.plans.main import run, run_joined
from etl_sentinel_imagery_spark.sources.config import AcquisitionConfig
from etl_sentinel_imagery_spark.sources.catalog_fixture import catalog_df


def _write_aoi(tmp_path) -> str:
    fc = {
        "type": "FeatureCollection",
        "features": [
            {
                "type": "Feature",
                "properties": {"fid": 1, "tile_id": "31TCJ"},
                "geometry": {
                    "type": "Polygon",
                    "coordinates": [
                        [[1.25, 43.25], [1.75, 43.25], [1.75, 43.75],
                         [1.25, 43.75], [1.25, 43.25]]
                    ],
                },
            },
            {  # AOI with zero coverage → empty selection, tolerated
                "type": "Feature",
                "properties": {"fid": 2},
                "geometry": {
                    "type": "Polygon",
                    "coordinates": [
                        [[30.0, 10.0], [30.5, 10.0], [30.5, 10.5],
                         [30.0, 10.5], [30.0, 10.0]]
                    ],
                },
            },
        ],
    }
    p = tmp_path / "aoi.geojson"
    p.write_text(json.dumps(fc))
    return str(p)


def test_run_joined_single_plan(spark, tmp_path):
    """Default mode: both AOIs resolved in ONE joined plan — the covered
    AOI selects p-full, the off-catalog AOI silently yields no row."""
    cfg = AcquisitionConfig(aoi_path=_write_aoi(tmp_path))
    cache = str(tmp_path / "cache_joined")
    selection, stacked = run_joined(
        spark,
        cfg,
        catalog_df(spark),
        SyntheticBandSource(height=4, width=4),
        cache_dir=cache,
    )
    sel = selection.collect()
    assert [(r["fid"], r["uuid"]) for r in sel] == [(1, "p-full")]
    st = stacked.collect()
    assert len(st) == 1 and st[0]["product_id"] == "p-full"
    cached = spark.read.parquet(cache)
    assert cached.select("uuid").distinct().count() == 1


def test_run_batch_over_aoi_file(spark, tmp_path):
    cfg = AcquisitionConfig(aoi_path=_write_aoi(tmp_path))
    cache = str(tmp_path / "cache")
    results = run(
        spark,
        cfg,
        catalog_df(spark),
        SyntheticBandSource(height=4, width=4),
        cache_dir=cache,
    )
    assert len(results) == 2
    first = results[0].collect()
    assert len(first) == 1 and first[0]["product_id"] == "p-full"
    assert results[1].isEmpty()  # off-catalog AOI bails out empty, no raise
    cached = spark.read.parquet(cache)
    assert cached.select("uuid").distinct().count() == 1
