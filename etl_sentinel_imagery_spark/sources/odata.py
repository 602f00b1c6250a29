"""OData catalog-source pushdown: engine predicates → `$filter` strings.

The reference pushes its entire predicate set server-side as an OData
`$filter` (`/root/reference/code/imagery_store.py:216-221` by-tile,
`:182-187` by-AOI). In this engine the catalog is normally a DataFrame
(Catalyst pushes the same predicates into the parquet scan for free —
SURVEY.md §4); this module is the live-source counterpart: it renders
the engine's selection parameters into exactly the filter strings a DSv2
`SupportsPushDownFilters` connector would emit, so a networked
deployment keeps pushdown parity with the reference. No network calls
happen here — tests assert string construction.
"""

from __future__ import annotations

from dataclasses import dataclass

ODATA_BASE = "https://catalogue.dataspace.copernicus.eu/odata/v1/Products"


@dataclass(frozen=True)
class CatalogQuery:
    platform: str
    product_type: str
    date_start: str
    date_end: str
    cloud_max: float
    tile_id: str | None = None
    aoi_wkt: str | None = None
    top: int = 20  # the server's page cap (imagery_store.py:45)


def _attr_eq(name: str, value: str) -> str:
    return (
        "Attributes/OData.CSC.StringAttribute/any("
        f"att:att/Name eq '{name}' and "
        f"att/OData.CSC.StringAttribute/Value eq '{value}')"
    )


def _attr_le(name: str, value: float) -> str:
    return (
        "Attributes/OData.CSC.DoubleAttribute/any("
        f"att:att/Name eq '{name}' and "
        f"att/OData.CSC.DoubleAttribute/Value le {value})"
    )


def build_filter(q: CatalogQuery) -> str:
    """The `$filter` expression — same predicate set, same strictness
    (gt/lt date bounds) as the reference's hand-built strings."""
    parts = [
        f"Collection/Name eq '{q.platform}'",
        _attr_eq("productType", q.product_type),
        f"ContentDate/Start gt {q.date_start}T00:00:00.000Z",
        f"ContentDate/Start lt {q.date_end}T00:00:00.000Z",
        _attr_le("cloudCover", q.cloud_max),
    ]
    if q.tile_id is not None:
        parts.insert(2, _attr_eq("tileId", q.tile_id))
    if q.aoi_wkt is not None:
        parts.append(f"OData.CSC.Intersects(area=geography'SRID=4326;{q.aoi_wkt}')")
    return " and ".join(parts)


def build_url(q: CatalogQuery) -> str:
    return (
        f"{ODATA_BASE}?$filter={build_filter(q)}"
        f"&$expand=Attributes&$top={q.top}"
    )
