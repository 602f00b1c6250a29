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


def test_dsv2_connector_pushes_filters(spark):
    """The Python DataSource claims the reference's predicate set at
    planning time: PushedFilters appear on the BatchScan, Spark's
    residual filter keeps only null checks, and results match the
    DataFrame-catalog path exactly."""
    import io
    from contextlib import redirect_stdout

    from etl_sentinel_imagery_spark.operators.selection import filter_products
    from etl_sentinel_imagery_spark.sources import odata_source
    from etl_sentinel_imagery_spark.sources.catalog_fixture import catalog_df

    odata_source.register(spark)
    scan = spark.read.format("odata_catalog").load()
    sel = filter_products(scan, "SENTINEL-2", "S2MSI2A", "2023-05-01",
                          "2023-09-05", 4.0)

    buf = io.StringIO()
    with redirect_stdout(buf):
        sel.explain("formatted")
    plan = buf.getvalue()
    assert "PushedFilters: [EqualTo(platform,SENTINEL-2)" in plan
    assert "LessThanOrEqual(cloudCover,4.0)" in plan
    # everything pushable was pushed: the post-scan Filter has no
    # comparison predicates left, only the isnotnull guards
    cond = [l for l in plan.splitlines() if l.startswith("Condition")]
    assert cond and "=" not in cond[0].replace("Condition :", "")

    got = sorted(r["Id"] for r in sel.select("Id").collect())
    want_df = filter_products(catalog_df(spark), "SENTINEL-2", "S2MSI2A",
                              "2023-05-01", "2023-09-05", 4.0)
    want = sorted(r["Id"] for r in want_df.select("Id").collect())
    assert got == want and len(got) == 7


def test_dsv2_rendered_filter_matches_reference_strings():
    """Pushed predicates render to the same OData clauses build_filter
    emits (imagery_store.py:216-221 parity at the connector boundary)."""
    from pyspark.sql.datasource import EqualTo, GreaterThan, LessThanOrEqual

    from etl_sentinel_imagery_spark.sources.odata_source import ODataCatalogReader

    r = ODataCatalogReader(None, {})
    residual = list(
        r.pushFilters(
            [
                EqualTo(("platform",), "SENTINEL-2"),
                EqualTo(("productType",), "S2MSI2A"),
                GreaterThan(("ContentDate_Start",), "2023-05-01"),
                LessThanOrEqual(("cloudCover",), 4.0),
                EqualTo(("Id",), "p-full"),  # not OData-expressible
            ]
        )
    )
    assert len(residual) == 1 and residual[0].attribute == ("Id",)
    f = r.rendered_filter()
    assert "Collection/Name eq 'SENTINEL-2'" in f
    assert "att/Name eq 'productType' and" in f
    assert "ContentDate/Start gt 2023-05-01T00:00:00.000Z" in f
    assert "att/OData.CSC.DoubleAttribute/Value le 4.0" in f


def test_dsv2_pagination_partitions(spark):
    """$top/$skip pagination: page_size=5 over the 12-row fixture gives
    one InputPartition per page and identical union-of-pages results."""
    from etl_sentinel_imagery_spark.sources import odata_source

    odata_source.register(spark)
    paged = (
        spark.read.format("odata_catalog").option("page_size", "5").load()
    )
    assert paged.rdd.getNumPartitions() == 3  # ceil(12 / 5)
    whole = spark.read.format("odata_catalog").load()
    assert sorted(r["Id"] for r in paged.collect()) == sorted(
        r["Id"] for r in whole.collect()
    )
    # pushdown composes with pagination: the server filters BEFORE
    # paging, so filtered pages still union to the filtered catalog
    filtered = paged.filter("platform = 'SENTINEL-2' AND cloudCover <= 4.0")
    assert filtered.count() == 10


def test_dsv2_write_path_two_phase_commit(spark, tmp_path):
    """The connector's POST side: executors stage JSON-lines parts,
    commit() publishes them + a manifest; append-only enforced."""
    import json
    import os

    from etl_sentinel_imagery_spark.sources import odata_source
    from etl_sentinel_imagery_spark.sources.catalog_fixture import (
        catalog_df,
    )

    odata_source.register(spark)
    out = str(tmp_path / "catalog_post")
    new_products = catalog_df(spark).filter("Id = 'p-full'")
    (
        new_products.write.format("odata_catalog")
        .mode("append")
        .option("path", out)
        .save()
    )
    files = [f for f in os.listdir(out) if f.endswith(".jsonl")]
    assert files and not os.listdir(os.path.join(out, "_staging"))
    manifest = json.load(open(os.path.join(out, "_manifest.json")))
    assert manifest["n_rows"] == 1
    rows = [
        json.loads(line)
        for f in files
        for line in open(os.path.join(out, f))
    ]
    assert [r["Id"] for r in rows] == ["p-full"]
    assert rows[0]["Attributes"][0]["Name"]  # nested structs serialized

    import pytest as _pytest

    with _pytest.raises(Exception, match="append-only"):
        (
            new_products.write.format("odata_catalog")
            .mode("overwrite")
            .option("path", out)
            .save()
        )
