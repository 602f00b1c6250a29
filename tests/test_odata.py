"""OData `$filter` pushdown-string construction (S3 source parity)."""

from __future__ import annotations

from etl_sentinel_imagery_spark.sources.odata import (
    CatalogQuery,
    build_filter,
    build_url,
)

Q = CatalogQuery(
    platform="SENTINEL-2",
    product_type="S2MSI2A",
    date_start="2023-05-01",
    date_end="2023-09-05",
    cloud_max=4.0,
    tile_id="31TCJ",
)


def test_filter_contains_every_reference_predicate():
    f = build_filter(Q)
    assert "Collection/Name eq 'SENTINEL-2'" in f
    assert "att/Name eq 'productType'" in f and "'S2MSI2A'" in f
    assert "att/Name eq 'tileId'" in f and "'31TCJ'" in f
    # strict bounds, like the reference's gt/lt (imagery_store.py:218)
    assert "ContentDate/Start gt 2023-05-01T00:00:00.000Z" in f
    assert "ContentDate/Start lt 2023-09-05T00:00:00.000Z" in f
    assert "att/Name eq 'cloudCover'" in f and "le 4.0" in f


def test_spatial_intersects_only_for_aoi_queries():
    assert "Intersects" not in build_filter(Q)
    q2 = CatalogQuery(
        platform="SENTINEL-2",
        product_type="S2MSI2A",
        date_start="2023-05-01",
        date_end="2023-09-05",
        cloud_max=4.0,
        aoi_wkt="POLYGON ((1 43, 2 43, 2 44, 1 44, 1 43))",
    )
    f2 = build_filter(q2)
    assert "OData.CSC.Intersects(area=geography'SRID=4326;POLYGON" in f2


def test_url_has_expand_and_page_cap():
    url = build_url(Q)
    assert url.startswith("https://catalogue.dataspace.copernicus.eu/odata/v1/Products?$filter=")
    assert "$expand=Attributes" in url
    assert "$top=20" in url  # server page cap, imagery_store.py:45
