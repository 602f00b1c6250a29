"""Geometry kernel: WKT parsing, areas, and polygon overlay — numpy-pure.

The reference leans on shapely/geopandas (`dataset.py:37-40`,
`imagery_store.py:242-251`); neither ships in this environment, so the
engine carries a small exact kernel: WKT polygon parse, shoelace area,
Sutherland–Hodgman clipping (exact intersection of any simple polygon
with a CONVEX clip region — AOIs are bboxes/convex in the reference's
usage), and point-in-polygon. Vectorized entry points are Arrow-batched
pandas UDFs; the AOI side is closed over (a handful of scalars — Spark
serializes it into the task closure, the moral equivalent of a broadcast
variable for this size).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType, DoubleType

_WKT_POLY_RE = re.compile(r"POLYGON\s*\(\((.+?)\)\)", re.IGNORECASE)


def parse_wkt_polygon(wkt: str) -> np.ndarray:
    """Outer ring of a WKT POLYGON as an (n, 2) float array (closed ring's
    duplicate last vertex dropped). Raises ValueError on malformed input."""
    m = _WKT_POLY_RE.search(wkt)
    if not m:
        raise ValueError(f"not a WKT polygon: {wkt[:80]!r}")
    pts = np.array(
        [[float(v) for v in p.strip().split()] for p in m.group(1).split(",")]
    )
    if len(pts) > 1 and np.array_equal(pts[0], pts[-1]):
        pts = pts[:-1]
    return pts


def to_wkt_polygon(ring: np.ndarray) -> str:
    pts = list(ring) + [ring[0]]
    inner = ", ".join(f"{x:g} {y:g}" for x, y in pts)
    return f"POLYGON (({inner}))"


def shoelace_area(ring: np.ndarray) -> float:
    """Absolute polygon area via the shoelace formula."""
    x, y = ring[:, 0], ring[:, 1]
    return abs(float(np.dot(x, np.roll(y, -1)) - np.dot(np.roll(x, -1), y))) / 2.0


def bbox(ring: np.ndarray) -> tuple[float, float, float, float]:
    return (
        float(ring[:, 0].min()),
        float(ring[:, 1].min()),
        float(ring[:, 0].max()),
        float(ring[:, 1].max()),
    )


def _is_ccw(ring: np.ndarray) -> bool:
    x, y = ring[:, 0], ring[:, 1]
    return (np.dot(x, np.roll(y, -1)) - np.dot(np.roll(x, -1), y)) > 0


def clip_polygon_convex(subject: np.ndarray, clip: np.ndarray) -> np.ndarray:
    """Sutherland–Hodgman: clip `subject` (any simple polygon) against the
    CONVEX polygon `clip`. Returns the intersection ring (possibly empty).
    Exact for the coverage-ranking use case (AOI bboxes are convex)."""
    if not _is_ccw(clip):
        clip = clip[::-1]
    output = [tuple(p) for p in subject]
    n = len(clip)
    for i in range(n):
        if not output:
            return np.empty((0, 2))
        ax, ay = clip[i]
        bx, by = clip[(i + 1) % n]
        ex, ey = bx - ax, by - ay

        def inside(p):
            return ex * (p[1] - ay) - ey * (p[0] - ax) >= 0

        def intersect(p, q):
            # t solves cross(e, p + t·d − a) = 0 → t = −cross(e, p−a)/cross(e, d)
            dx, dy = q[0] - p[0], q[1] - p[1]
            denom = ex * dy - ey * dx
            t = (ey * (p[0] - ax) - ex * (p[1] - ay)) / denom
            return (p[0] + t * dx, p[1] + t * dy)

        input_ring, output = output, []
        prev = input_ring[-1]
        for cur in input_ring:
            if inside(cur):
                if not inside(prev):
                    output.append(intersect(prev, cur))
                output.append(cur)
            elif inside(prev):
                output.append(intersect(prev, cur))
            prev = cur
    return np.array(output) if output else np.empty((0, 2))


def intersection_area(subject: np.ndarray, clip_convex: np.ndarray) -> float:
    inter = clip_polygon_convex(subject, clip_convex)
    return shoelace_area(inter) if len(inter) >= 3 else 0.0


def point_in_polygon(px: float, py: float, ring: np.ndarray) -> bool:
    """Ray-casting point-in-polygon (edges count as inside)."""
    n = len(ring)
    inside = False
    for i in range(n):
        x1, y1 = ring[i]
        x2, y2 = ring[(i + 1) % n]
        if min(y1, y2) <= py <= max(y1, y2):
            cross = (x2 - x1) * (py - y1) - (y2 - y1) * (px - x1)
            if cross == 0 and min(x1, x2) <= px <= max(x1, x2):
                return True
        if (y1 > py) != (y2 > py):
            xin = x1 + (py - y1) * (x2 - x1) / (y2 - y1)
            if px < xin:
                inside = not inside
    return inside


# --- Spark-facing vectorized UDFs ----------------------------------------
def wkt_area_udf() -> Column:
    @F.pandas_udf(DoubleType())
    def _area(wkts: pd.Series) -> pd.Series:
        return wkts.map(lambda w: shoelace_area(parse_wkt_polygon(w)))

    return _area


def make_coverage_ratio_udf(aoi_wkt: str):
    """UDF: exact area(footprint ∩ AOI) / area(AOI) for each footprint WKT.

    Exact-overlay variant of operators.selection.with_coverage_ratio —
    needed when footprints are not axis-aligned (true Sentinel-2 swath
    footprints are clipped parallelograms)."""
    aoi = parse_wkt_polygon(aoi_wkt)
    aoi_area = shoelace_area(aoi)

    @F.pandas_udf(DoubleType())
    def _ratio(wkts: pd.Series) -> pd.Series:
        return wkts.map(
            lambda w: intersection_area(parse_wkt_polygon(w), aoi) / aoi_area
        )

    return _ratio


def make_intersects_udf(aoi_wkt: str):
    aoi = parse_wkt_polygon(aoi_wkt)

    @F.pandas_udf(BooleanType())
    def _intersects(wkts: pd.Series) -> pd.Series:
        return wkts.map(
            lambda w: intersection_area(parse_wkt_polygon(w), aoi) > 0.0
        )

    return _intersects
