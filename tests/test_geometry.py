"""Golden tests for the numpy geometry kernel (SURVEY.md §5 step 2)."""

from __future__ import annotations

import numpy as np
import pytest

from etl_sentinel_imagery_spark.functions.geometry import (
    bbox,
    clip_polygon_convex,
    intersection_area,
    parse_wkt_polygon,
    point_in_polygon,
    shoelace_area,
    to_wkt_polygon,
)

SQUARE = np.array([[0.0, 0.0], [2.0, 0.0], [2.0, 2.0], [0.0, 2.0]])


def test_parse_wkt_roundtrip():
    ring = parse_wkt_polygon("POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))")
    assert np.array_equal(ring, SQUARE)
    assert parse_wkt_polygon(to_wkt_polygon(ring)).shape == (4, 2)


def test_parse_wkt_rejects_garbage():
    with pytest.raises(ValueError):
        parse_wkt_polygon("LINESTRING (0 0, 1 1)")


def test_shoelace_area():
    assert shoelace_area(SQUARE) == 4.0
    tri = np.array([[0, 0], [1, 0], [0, 1]], dtype=float)
    assert shoelace_area(tri) == 0.5
    # orientation-independent
    assert shoelace_area(SQUARE[::-1]) == 4.0


def test_bbox():
    assert bbox(SQUARE) == (0.0, 0.0, 2.0, 2.0)


def test_clip_identical():
    out = clip_polygon_convex(SQUARE, SQUARE)
    assert shoelace_area(out) == 4.0


def test_clip_partial_overlap():
    shifted = SQUARE + 1.0  # unit overlap square [1,2]×[1,2]
    out = clip_polygon_convex(SQUARE, shifted)
    assert shoelace_area(out) == pytest.approx(1.0)


def test_clip_disjoint():
    far = SQUARE + 10.0
    assert intersection_area(SQUARE, far) == 0.0


def test_clip_triangle_against_square():
    # right triangle half-in: (−1,0)(1,0)(−1,2) clipped by unit-square×2
    tri = np.array([[-1.0, 0.0], [1.0, 0.0], [-1.0, 2.0]])
    got = intersection_area(tri, SQUARE)
    # inside piece: triangle (0,0)(1,0)(0,1) → area 0.5
    assert got == pytest.approx(0.5)


def test_clip_concave_subject():
    # concave "L" subject against a convex square — S-H handles concave subjects
    l_shape = np.array(
        [[0.0, 0.0], [3.0, 0.0], [3.0, 1.0], [1.0, 1.0], [1.0, 3.0], [0.0, 3.0]]
    )
    clip = np.array([[0.0, 0.0], [2.0, 0.0], [2.0, 2.0], [0.0, 2.0]])
    got = intersection_area(l_shape, clip)
    # L ∩ [0,2]² = [0,2]×[0,1] ∪ [0,1]×[1,2] → 2 + 1 = 3
    assert got == pytest.approx(3.0)


def test_point_in_polygon():
    assert point_in_polygon(1.0, 1.0, SQUARE)
    assert point_in_polygon(0.0, 1.0, SQUARE)  # boundary counts inside
    assert not point_in_polygon(3.0, 1.0, SQUARE)


def test_coverage_matches_bbox_fastpath():
    """The exact overlay and the bbox fast path agree on axis-aligned
    footprints (the invariant that justifies the fast path in
    operators.selection.with_coverage_ratio)."""
    aoi = np.array([[1.25, 43.25], [1.75, 43.25], [1.75, 43.75], [1.25, 43.75]])
    foot = np.array([[1.5, 43.0], [2.5, 43.0], [2.5, 44.0], [1.5, 44.0]])
    exact = intersection_area(foot, aoi) / shoelace_area(aoi)
    iw = min(2.5, 1.75) - max(1.5, 1.25)
    ih = min(44.0, 43.75) - max(43.0, 43.25)
    assert exact == pytest.approx(iw * ih / 0.25)
    assert exact == pytest.approx(0.5)


# --- general (concave / multi) overlay ------------------------------------
def test_triangulate_partitions_area():
    from etl_sentinel_imagery_spark.functions.geometry import (
        shoelace_area,
        triangulate,
    )

    L = np.array([(0, 0), (2, 0), (2, 1), (1, 1), (1, 2), (0, 2)], dtype=float)
    tris = triangulate(L)
    assert len(tris) == 4  # n-2 triangles for a simple hexagon
    assert abs(sum(shoelace_area(t) for t in tris) - 3.0) < 1e-12


def test_concave_clip_exact_area():
    """L-shaped AOI ∩ unit square with known closed-form answer."""
    from etl_sentinel_imagery_spark.functions.geometry import (
        intersection_area_general,
    )

    L = np.array([(0, 0), (2, 0), (2, 1), (1, 1), (1, 2), (0, 2)], dtype=float)
    # square covering [0.5, 1.5]²: inside-L part is everything except the
    # [1, 1.5]² quadrant → 1 − 0.25
    sq = np.array([(0.5, 0.5), (1.5, 0.5), (1.5, 1.5), (0.5, 1.5)], dtype=float)
    assert abs(intersection_area_general(sq, L) - 0.75) < 1e-12
    # convex clip falls back to the single-pass path, same answer
    assert abs(intersection_area_general(L, sq) - 0.75) < 1e-12


def test_concave_clip_matches_grid_estimate():
    """Randomized star-shaped concave AOIs: exact kernel vs a dense
    point-in-polygon grid (Monte-Carlo-free, deterministic)."""
    from etl_sentinel_imagery_spark.functions.geometry import (
        intersection_area_general,
        point_in_polygon,
    )

    rng = np.random.RandomState(11)
    for _ in range(3):
        # star polygon around (0.5, 0.5): angles sorted, radii vary → simple
        angles = np.sort(rng.uniform(0, 2 * np.pi, 9))
        radii = rng.uniform(0.15, 0.45, 9)
        ring = np.stack(
            [0.5 + radii * np.cos(angles), 0.5 + radii * np.sin(angles)], axis=1
        )
        subject = np.array([(0.2, 0.2), (0.8, 0.2), (0.8, 0.8), (0.2, 0.8)])
        exact = intersection_area_general(subject, ring)
        n = 220
        xs = (np.arange(n) + 0.5) / n
        hits = sum(
            point_in_polygon(x, y, ring) and point_in_polygon(x, y, subject)
            for x in xs
            for y in xs
        )
        approx = hits / (n * n)
        assert abs(exact - approx) < 0.01, (exact, approx)


def test_multipolygon_footprint_parse_and_area():
    from etl_sentinel_imagery_spark.functions.geometry import (
        multi_intersection_area,
        parse_wkt_rings,
    )

    wkt = (
        "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), "
        "((2 0, 3 0, 3 1, 2 1, 2 0)))"
    )
    rings = parse_wkt_rings(wkt)
    assert len(rings) == 2
    clip = [np.array([(0.5, 0.0), (2.5, 0.0), (2.5, 1.0), (0.5, 1.0)])]
    # left member contributes 0.5, right member 0.5
    assert abs(multi_intersection_area(wkt, clip) - 1.0) < 1e-12


def test_multipolygon_member_with_hole_keeps_outer_ring():
    """Review regression: a member WITH a hole must contribute its outer
    ring (previously the whole member silently vanished)."""
    from etl_sentinel_imagery_spark.functions.geometry import parse_wkt_rings

    wkt = (
        "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), "
        "((2 2, 6 2, 6 6, 2 6, 2 2), (3 3, 4 3, 4 4, 3 4, 3 3)))"
    )
    rings = parse_wkt_rings(wkt)
    assert len(rings) == 2
    assert rings[1].tolist() == [[2, 2], [6, 2], [6, 6], [2, 6]]

    only_holed = "MULTIPOLYGON (((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1)))"
    (ring,) = parse_wkt_rings(only_holed)
    assert ring.tolist() == [[0, 0], [4, 0], [4, 4], [0, 4]]


def test_polygon_with_hole_outer_ring_only():
    from etl_sentinel_imagery_spark.functions.geometry import parse_wkt_polygon

    ring = parse_wkt_polygon(
        "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1))"
    )
    assert ring.tolist() == [[0, 0], [4, 0], [4, 4], [0, 4]]


def test_signed_rings_and_hole_area_arithmetic():
    """Holes participate via signed inclusion-exclusion: a donut subject
    against a clip overlapping the hole subtracts exactly the hole∩clip
    area; a subject fully inside the hole intersects nothing."""
    from etl_sentinel_imagery_spark.functions.geometry import (
        multi_intersection_area,
        parse_wkt_signed_rings,
    )

    donut = "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (3 3, 7 3, 7 7, 3 7, 3 3))"
    rings = parse_wkt_signed_rings(donut)
    assert [s for _, s in rings] == [1, -1]

    # clip covering everything → donut's own area = 100 − 16
    clip_all = parse_wkt_signed_rings("POLYGON ((-1 -1, 11 -1, 11 11, -1 11, -1 -1))")
    assert abs(multi_intersection_area(donut, clip_all) - 84.0) < 1e-12

    # clip half-overlapping the hole: [0,5]² ∩ donut = 25 − 4
    clip_q = parse_wkt_signed_rings("POLYGON ((0 0, 5 0, 5 5, 0 5, 0 0))")
    assert abs(multi_intersection_area(donut, clip_q) - 21.0) < 1e-12

    # subject entirely inside the hole → zero intersection
    inner = "POLYGON ((4 4, 6 4, 6 6, 4 6, 4 4))"
    donut_rings = parse_wkt_signed_rings(donut)
    assert multi_intersection_area(inner, donut_rings) == 0.0

    # donut-vs-donut: both holes subtract, hole∩hole adds back once
    donut2 = "POLYGON ((2 2, 12 2, 12 12, 2 12, 2 2), (5 5, 9 5, 9 9, 5 9, 5 5))"
    # outer∩outer = 8·8=64; hole1∩outer2 = [3,7]²∩[2,12]² = 16
    # outer1∩hole2 = [5,9]²∩[0,10]² = 16; hole1∩hole2 = [5,7]² = 4
    expect = 64.0 - 16.0 - 16.0 + 4.0
    assert abs(
        multi_intersection_area(donut, parse_wkt_signed_rings(donut2)) - expect
    ) < 1e-12


def test_coverage_udf_with_holed_aoi(spark):
    """End-to-end: a donut AOI's coverage ratio divides by the TRUE AOI
    area (outer − hole) and excludes footprint area inside the hole."""
    from etl_sentinel_imagery_spark.functions.geometry import (
        make_coverage_ratio_udf,
        make_intersects_udf,
    )

    donut = "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (3 3, 7 3, 7 7, 3 7, 3 3))"
    df = spark.createDataFrame(
        [
            ("full", "POLYGON ((-1 -1, 11 -1, 11 11, -1 11, -1 -1))"),
            ("in_hole", "POLYGON ((4 4, 6 4, 6 6, 4 6, 4 4))"),
            ("half", "POLYGON ((0 0, 5 0, 5 5, 0 5, 0 0))"),
        ],
        "name string, footprint string",
    )
    import pyspark.sql.functions as F

    out = {
        r["name"]: (r["ratio"], r["hits"])
        for r in df.select(
            "name",
            make_coverage_ratio_udf(donut)(F.col("footprint")).alias("ratio"),
            make_intersects_udf(donut)(F.col("footprint")).alias("hits"),
        ).collect()
    }
    assert abs(out["full"][0] - 1.0) < 1e-12 and out["full"][1]
    assert out["in_hole"][0] == 0.0 and not out["in_hole"][1]
    assert abs(out["half"][0] - 21.0 / 84.0) < 1e-12 and out["half"][1]


# --- self-intersecting rings: untwist into simple loops -------------------


def test_bowtie_untwists_into_two_triangles():
    from etl_sentinel_imagery_spark.functions.geometry import (
        intersection_area_general,
        is_simple_ring,
        split_self_intersections,
    )
    import numpy as np

    bowtie = np.array([(0.0, 0.0), (2.0, 2.0), (2.0, 0.0), (0.0, 2.0)])
    assert not is_simple_ring(bowtie)
    loops = split_self_intersections(bowtie)
    assert len(loops) == 2
    areas = sorted(
        round(abs(a), 10)
        for a in (
            (loops[0][:, 0] * np.roll(loops[0][:, 1], -1)
             - np.roll(loops[0][:, 0], -1) * loops[0][:, 1]).sum() / 2,
            (loops[1][:, 0] * np.roll(loops[1][:, 1], -1)
             - np.roll(loops[1][:, 0], -1) * loops[1][:, 1]).sum() / 2,
        )
    )
    assert areas == [1.0, 1.0]
    big = np.array([(-10.0, -10.0), (10.0, -10.0), (10.0, 10.0), (-10.0, 10.0)])
    assert abs(intersection_area_general(big, bowtie) - 2.0) < 1e-12
    # clipping still works through the untwist: x>=1 keeps exactly the
    # right triangle (the left one only touches the line at (1,1))
    right = np.array([(1.0, -10.0), (10.0, -10.0), (10.0, 10.0), (1.0, 10.0)])
    assert abs(intersection_area_general(right, bowtie) - 1.0) < 1e-12


def test_double_crossing_zigzag_untwists_exactly():
    """A zigzag stroke with two proper crossings: three disjoint loops,
    exact union area through the clip path."""
    import numpy as np

    from etl_sentinel_imagery_spark.functions.geometry import (
        intersection_area_general,
        split_self_intersections,
    )

    # zigzag hexagon with two proper crossings at (-1,0) and (1,0):
    # untwists into left triangle (1) + center diamond (2) + right
    # triangle (1), pairwise disjoint
    eight = np.array(
        [
            (-2.0, -1.0), (-2.0, 1.0), (0.0, -1.0),
            (2.0, 1.0), (2.0, -1.0), (0.0, 1.0),
        ]
    )
    loops = split_self_intersections(eight)
    assert len(loops) == 3
    big = np.array([(-10.0, -10.0), (10.0, -10.0), (10.0, 10.0), (-10.0, 10.0)])
    assert abs(intersection_area_general(big, eight) - 4.0) < 1e-12


def test_pentagram_stroke_union_area_inclusion_exclusion():
    """A {5/2} star stroke's stack-walk loops OVERLAP in the core
    (winding 2); inclusion–exclusion must subtract the overlap back out.
    Cross-checked two ways: the closed-form pentagram union area, and a
    point-in-any-loop grid rasterization."""
    import math

    import numpy as np

    from etl_sentinel_imagery_spark.functions.geometry import (
        intersection_area_general,
        split_self_intersections,
    )

    star = np.array(
        [
            (math.cos(math.radians(90 + i * 144)), math.sin(math.radians(90 + i * 144)))
            for i in range(5)
        ]
    )
    big = np.array([(-2.0, -2.0), (2.0, -2.0), (2.0, 2.0), (-2.0, 2.0)])
    got = intersection_area_general(big, star)

    # closed form for a {5/2} pentagram with unit circumradius:
    # 10 · (tip triangle) + inner pentagon
    c1, c2 = math.cos(math.pi / 5), math.cos(2 * math.pi / 5)
    r_inner_vertex = c2 / c1  # inner pentagon circumradius
    pentagon = 2.5 * r_inner_vertex**2 * math.sin(2 * math.pi / 5)
    # tip: isoceles triangle between two adjacent inner vertices and an
    # outer vertex; 5 tips total
    inner_side = 2 * r_inner_vertex * math.sin(math.pi / 5)
    tip_h = 1.0 - r_inner_vertex * math.cos(math.pi / 5)
    tips = 5 * 0.5 * inner_side * tip_h
    closed_form = pentagon + tips
    assert abs(got - closed_form) < 1e-9, (got, closed_form)

    # grid rasterization cross-check (union = point in ANY loop)
    loops = split_self_intersections(star)

    def in_loop(p, ring):
        n, c = len(ring), False
        for i in range(n):
            a, b = ring[i], ring[(i + 1) % n]
            if (a[1] > p[1]) != (b[1] > p[1]):
                x = a[0] + (p[1] - a[1]) / (b[1] - a[1]) * (b[0] - a[0])
                if p[0] < x:
                    c = not c
        return c

    step = 0.02
    xs = np.arange(-1.0, 1.0, step)
    hits = sum(
        1
        for x in xs
        for y in xs
        if any(in_loop((x + step / 2, y + step / 2), lp) for lp in loops)
    )
    assert abs(got - hits * step * step) < 0.03


def test_nested_loop_fold_unions_without_double_count():
    import numpy as np

    from etl_sentinel_imagery_spark.functions.geometry import (
        intersection_area_general,
    )

    # one crossing at (4,6); the popped inner loop (area 8) lies fully
    # INSIDE the outer loop (area 44) — union must be 44, not 52
    folded = np.array(
        [
            (0.0, 0.0), (6.0, 0.0), (6.0, 6.0), (2.0, 6.0),
            (2.0, 2.0), (4.0, 2.0), (4.0, 8.0), (0.0, 8.0),
        ]
    )
    big = np.array([(-10.0, -10.0), (10.0, -10.0), (10.0, 10.0), (-10.0, 10.0)])
    assert abs(intersection_area_general(big, folded) - 44.0) < 1e-9
    # and a clip that slices through both loops stays exact: x >= 3
    # keeps 3x2=6 of the outer band x∈[3,6]y∈[0,6], plus the x∈[4,6]
    # rest... easier: complement check — left half + right half == whole
    left = np.array([(-10.0, -10.0), (3.0, -10.0), (3.0, 10.0), (-10.0, 10.0)])
    right = np.array([(3.0, -10.0), (10.0, -10.0), (10.0, 10.0), (3.0, 10.0)])
    la = intersection_area_general(left, folded)
    ra = intersection_area_general(right, folded)
    assert abs(la + ra - 44.0) < 1e-9


def test_many_disjoint_loops_skip_inclusion_exclusion_cap():
    """11 pairwise-disjoint loops from one zigzag stroke: the 2^k
    inclusion-exclusion cap applies per OVERLAP CLUSTER, so disjoint
    loops (11 singleton clusters) must answer exactly, not raise."""
    import numpy as np

    from etl_sentinel_imagery_spark.functions.geometry import (
        intersection_area_general,
        split_self_intersections,
    )

    up = [(-2.0, -1.0), (-2.0, 1.0)] + [
        (float(4 * i), -1.0) if j == 0 else (float(4 * i + 2), 1.0)
        for i in range(5)
        for j in (0, 1)
    ]
    down = [(float(18), -1.0)] + [
        (float(16 - 4 * i), 1.0) if j == 0 else (float(14 - 4 * i), -1.0)
        for i in range(4)
        for j in (0, 1)
    ] + [(0.0, 1.0)]
    ring = np.array(up + down)
    loops = split_self_intersections(ring)
    assert len(loops) == 11  # well past the per-cluster cap of 8
    big = np.array([(-30.0, -30.0), (30.0, -30.0), (30.0, 30.0), (-30.0, 30.0)])
    got = intersection_area_general(big, ring)
    from etl_sentinel_imagery_spark.functions.geometry import shoelace_area

    assert abs(got - sum(shoelace_area(lp) for lp in loops)) < 1e-9


def test_slab_union_area_matches_inclusion_exclusion_on_pentagram():
    """The slab decomposition and the 2^k inclusion–exclusion are
    independent exact algorithms — on the pentagram's overlapping loops
    they must agree to float precision."""
    import math

    import numpy as np

    from etl_sentinel_imagery_spark.functions.geometry import (
        _slab_union_area,
        _union_intersection_area,
        split_self_intersections,
    )

    star = np.array(
        [
            (math.cos(math.radians(90 + i * 144)), math.sin(math.radians(90 + i * 144)))
            for i in range(5)
        ]
    )
    big = np.array([(-2.0, -2.0), (2.0, -2.0), (2.0, 2.0), (-2.0, 2.0)])
    loops = split_self_intersections(star)
    ie = _union_intersection_area(big, loops)
    slab = _slab_union_area(big, loops)
    assert abs(ie - slab) < 1e-9, (ie, slab)


def _grid_union_estimate(loops, lo, hi, step):
    import numpy as np

    from etl_sentinel_imagery_spark.functions.geometry import point_in_polygon

    xs = np.arange(lo, hi, step)
    return (
        sum(
            1
            for x in xs
            for y in xs
            if any(point_in_polygon(x + step / 2, y + step / 2, lp) for lp in loops)
        )
        * step
        * step
    )


def test_twelve_loop_winding_spiral_no_longer_refused():
    """A stroke that winds 12 times around the origin pops 12 mutually
    overlapping loops — the old 8-loop inclusion–exclusion cap raised
    here; the slab path answers it, cross-checked by rasterization."""
    import math

    import numpy as np

    from etl_sentinel_imagery_spark.functions.geometry import (
        intersection_area_general,
        split_self_intersections,
    )

    turns, per = 12, 24
    pts = []
    for i in range(turns * per):
        th = 2 * math.pi * i / per
        r = 1.0 + 0.04 * (i / per)
        pts.append((r * math.cos(th), r * math.sin(th)))
    ring = np.array(pts)
    loops = split_self_intersections(ring)
    assert len(loops) >= 10  # the winding structure really is deep
    big = np.array([(-3.0, -3.0), (3.0, -3.0), (3.0, 3.0), (-3.0, 3.0)])
    got = intersection_area_general(big, ring)  # must not raise
    est = _grid_union_estimate(loops, -1.6, 1.6, 0.02)
    assert abs(got - est) < 0.05, (got, est)


def test_random_stroke_property_slab_equals_inclusion_exclusion():
    """Property check on seeded random self-intersecting strokes: where
    the cluster is small enough for inclusion–exclusion, the two exact
    algorithms must agree to 1e-9; rasterization bounds both."""
    import numpy as np

    from etl_sentinel_imagery_spark.functions.geometry import (
        _slab_union_area,
        _union_intersection_area,
        split_self_intersections,
    )

    rng = np.random.default_rng(7)
    big = np.array([(-4.0, -4.0), (4.0, -4.0), (4.0, 4.0), (-4.0, 4.0)])
    checked = 0
    for _ in range(12):
        n = int(rng.integers(6, 11))
        ring = rng.uniform(-2.0, 2.0, size=(n, 2))
        loops = split_self_intersections(ring)
        if not loops or sum(len(lp) for lp in loops) < 3:
            continue
        try:
            ie = _union_intersection_area(big, loops)
        except ValueError:
            continue
        slab = _slab_union_area(big, loops)
        assert abs(ie - slab) < 1e-9, (ie, slab)
        est = _grid_union_estimate(loops, -2.2, 2.2, 0.02)
        assert abs(slab - est) < 0.08, (slab, est)
        checked += 1
    assert checked >= 6  # the property actually exercised real strokes
