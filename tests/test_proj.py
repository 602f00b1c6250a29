"""Ellipsoidal UTM goldens: independent quadrature + public constants.

No PROJ in this container, so the checks are self-grounding: the
meridian arc computed by direct numerical integration of the public
ellipse integrand, the published WGS84 quarter-meridian length, forward/
inverse consistency, and the known false-easting/scale structure.
"""

from __future__ import annotations

import numpy as np

from etl_sentinel_imagery_spark.functions.proj import utm_forward, utm_inverse

A, F = 6378137.0, 1.0 / 298.257223563
E2 = F * (2.0 - F)
K0 = 0.9996


def _meridian_arc(lat_deg: float) -> float:
    phi = np.linspace(0.0, np.radians(lat_deg), 1_000_001)
    integrand = A * (1.0 - E2) / (1.0 - E2 * np.sin(phi) ** 2) ** 1.5
    return float(np.trapz(integrand, phi))


def test_central_meridian_northing_matches_quadrature():
    fwd = utm_forward(31)
    for lat in (12.0, 45.0, 71.5):
        x, y = fwd(3.0, lat)
        assert abs(float(x) - 500000.0) < 1e-6  # false easting on the CM
        assert abs(float(y) - K0 * _meridian_arc(lat)) < 1e-3


def test_quarter_meridian_public_constant():
    # WGS84 quarter meridian: 10 001 965.729 m (public geodesy constant)
    assert abs(_meridian_arc(90.0) - 10001965.729) < 1e-2


def test_forward_inverse_roundtrip_grid():
    fwd, inv = utm_forward(31), utm_inverse(31)
    lons = np.linspace(0.2, 5.8, 15)
    lats = np.linspace(-79.0, 83.0, 20)
    lo, la = np.meshgrid(lons, lats)
    x, y = fwd(lo.ravel(), la.ravel())
    lo2, la2 = inv(x, y)
    assert np.max(np.abs(lo2 - lo.ravel())) < 1e-9
    assert np.max(np.abs(la2 - la.ravel())) < 1e-8


def test_southern_hemisphere_false_northing():
    fwd, inv = utm_forward(31, northern=False), utm_inverse(31, northern=False)
    x, y = fwd(3.0, -30.0)
    assert abs(float(y) - (10000000.0 - K0 * _meridian_arc(30.0))) < 1e-3
    lon, lat = inv(x, y)
    # series-truncation floor ≈ 3e-9° in latitude (~0.3 mm)
    assert abs(float(lon) - 3.0) < 1e-9 and abs(float(lat) + 30.0) < 1e-7


def test_scale_factor_structure():
    """Point scale on the central meridian is k0; it grows toward the
    zone edge (the defining property of secant TM)."""
    fwd = utm_forward(31)
    d = 1e-6  # degrees
    # arc over the short interval directly — differencing two full-arc
    # quadratures would cancel catastrophically
    phi = np.linspace(np.radians(45.0), np.radians(45.0 + d), 10_001)
    arc = float(np.trapz(A * (1.0 - E2) / (1.0 - E2 * np.sin(phi) ** 2) ** 1.5, phi))
    for lon, expect_min in ((3.0, None), (5.9, K0)):
        x1, y1 = fwd(lon, 45.0)
        x2, y2 = fwd(lon, 45.0 + d)
        k = float(np.hypot(x2 - x1, y2 - y1)) / arc
        if expect_min is None:
            assert abs(k - K0) < 1e-6
        else:
            assert k > K0 + 1e-4


def test_reproject_stack_uses_ellipsoid(spark):
    """The reprojected grid's latitude extent must match the ellipsoidal
    inverse of the source grid corners (a spherical inverse is ~0.19° off
    at this latitude — far outside this tolerance)."""
    from etl_sentinel_imagery_spark.operators.raster import STACK_SCHEMA
    from etl_sentinel_imagery_spark.operators.raster import reproject_stacks

    t = {"a": 10.0, "b": 0.0, "c": 600000.0, "d": 0.0, "e": -10.0, "f": 4800000.0}
    rows = [
        ("p-1", ["B02"], 4, 4, [[[i * 4 + j for j in range(4)] for i in range(4)]],
         t, "epsg:32631", 0)
    ]
    stacked = spark.createDataFrame(rows, schema=STACK_SCHEMA)
    out = reproject_stacks(stacked, "epsg:4326").collect()[0]
    inv = utm_inverse(31)
    lon_ul, lat_ul = inv(np.array([600000.0]), np.array([4800000.0]))
    assert abs(out["transform"]["f"] - float(lat_ul[0])) < 1e-3
    assert out["crs"] == "epsg:4326"
