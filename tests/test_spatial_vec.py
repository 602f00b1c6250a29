"""Row-parity of the vectorized even-odd kernel vs the scalar one.

The round-12 optimization replaced the per-row pdf.apply in
grid_spatial_join's exact stage with a per-(polygon, batch) numpy
kernel. The arithmetic is op-for-op identical, so every point —
including points ON edges and ring vertices, which the fixtures are
engineered to avoid but the operator must still honor — must get the
same boolean from both kernels.
"""

from __future__ import annotations

import numpy as np

from etl_sentinel_imagery_spark.functions.geometry import (
    parse_wkt_signed_rings,
)
from etl_sentinel_imagery_spark.operators.spatial_join import (
    point_in_wkt,
    point_in_wkt_vec,
)

#: Concave L-shape with a bevel edge and a square hole (the battery's
#: own shape family), plus a MULTIPOLYGON with two members.
WKTS = [
    "POLYGON((0 0, 12 0, 9 6, 6 6, 6 12, 0 12, 0 0), "
    "(2 2, 4 2, 4 4, 2 4, 2 2))",
    "MULTIPOLYGON(((0 0, 4 0, 4 4, 0 4, 0 0)), "
    "((10 10, 14 10, 14 14, 10 14, 10 10), "
    "(11 11, 13 11, 13 13, 11 13, 11 11)))",
]


def _grid_points() -> tuple[np.ndarray, np.ndarray]:
    # quarter-step grid: hits interiors, exteriors, edge midpoints,
    # vertices, hole edges — every branch of the kernel
    xs, ys = np.meshgrid(
        np.arange(-1.0, 15.01, 0.25), np.arange(-1.0, 15.01, 0.25)
    )
    return xs.ravel(), ys.ravel()


def test_vectorized_kernel_matches_scalar_pointwise():
    px, py = _grid_points()
    for wkt in WKTS:
        rings = parse_wkt_signed_rings(wkt)
        vec = point_in_wkt_vec(px, py, rings)
        scalar = np.array(
            [point_in_wkt(x, y, rings) for x, y in zip(px, py)]
        )
        mismatch = np.nonzero(vec != scalar)[0]
        assert mismatch.size == 0, (
            f"{wkt[:40]}...: {mismatch.size} mismatches, first at "
            f"({px[mismatch[0]]}, {py[mismatch[0]]})"
        )


def test_vectorized_kernel_random_slopes():
    # non-axis-parallel rings: exercises the xin division branch with
    # arbitrary float slopes; vectorized / must equal scalar / exactly
    rng = np.random.default_rng(7)
    pts = rng.uniform(-2, 8, size=(5, 2))
    hull = pts[np.argsort(np.arctan2(*(pts - pts.mean(0)).T[::-1]))]
    ring = np.vstack([hull, hull[:1]])
    wkt = (
        "POLYGON(("
        + ", ".join(f"{x} {y}" for x, y in ring)
        + "))"
    )
    rings = parse_wkt_signed_rings(wkt)
    px = rng.uniform(-3, 9, 4000)
    py = rng.uniform(-3, 9, 4000)
    vec = point_in_wkt_vec(px, py, rings)
    scalar = np.array(
        [point_in_wkt(x, y, rings) for x, y in zip(px, py)]
    )
    assert (vec == scalar).all()
