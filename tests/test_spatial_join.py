"""Grid-indexed spatial join == naive all-pairs point-in-polygon."""

from __future__ import annotations

import random

import pytest

from etl_sentinel_imagery_spark.functions.geometry import (
    parse_wkt_signed_rings,
)
from etl_sentinel_imagery_spark.operators.spatial_join import (
    grid_spatial_join,
    point_in_wkt,
)


def _quad_wkt(cx, cy, r):
    pts = [(cx - r, cy - r), (cx + r, cy - r), (cx + r, cy + r), (cx - r, cy + r)]
    ring = ", ".join(f"{x} {y}" for x, y in pts + [pts[0]])
    return f"POLYGON (({ring}))"


def _truth(points, polys):
    out = set()
    parsed = {pid: parse_wkt_signed_rings(w) for pid, w in polys}
    for pid_pt, x, y in points:
        for pid, _ in polys:
            if point_in_wkt(x, y, parsed[pid]):
                out.add((pid_pt, pid))
    return out


def test_matches_naive_all_pairs(spark):
    rng = random.Random(9)
    points = [
        (i, rng.uniform(0, 100), rng.uniform(0, 100)) for i in range(400)
    ]
    polys = [
        (j, _quad_wkt(rng.uniform(5, 95), rng.uniform(5, 95), rng.uniform(1, 12)))
        for j in range(40)
    ]
    p_df = spark.createDataFrame(points, "pid bigint, x double, y double")
    g_df = spark.createDataFrame(polys, "gid bigint, wkt string")
    got = {
        (r["pid"], r["poly_gid"])
        for r in grid_spatial_join(p_df, g_df, cell_size=8.0).collect()
    }
    want = _truth(points, polys)
    assert got == want and len(want) > 200


def test_polygon_with_hole_excludes_interior(spark):
    donut = (
        "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), "
        "(4 4, 6 4, 6 6, 4 6, 4 4))"
    )
    p_df = spark.createDataFrame(
        [(1, 2.0, 2.0), (2, 5.0, 5.0), (3, 11.0, 5.0)],
        "pid bigint, x double, y double",
    )
    g_df = spark.createDataFrame([(7, donut)], "gid bigint, wkt string")
    got = {
        r["pid"]
        for r in grid_spatial_join(p_df, g_df, cell_size=3.0).collect()
    }
    assert got == {1}  # in-hole and outside points excluded


def test_left_join_keeps_matchless_points(spark):
    p_df = spark.createDataFrame(
        [(1, 1.0, 1.0), (2, 50.0, 50.0)], "pid bigint, x double, y double"
    )
    g_df = spark.createDataFrame(
        [(7, _quad_wkt(1, 1, 2))], "gid bigint, wkt string"
    )
    rows = grid_spatial_join(
        p_df, g_df, cell_size=2.0, how="left"
    ).collect()
    by_pid = {r["pid"]: r["poly_gid"] for r in rows}
    assert by_pid == {1: 7, 2: None}


def test_point_in_multiple_overlapping_polygons(spark):
    p_df = spark.createDataFrame(
        [(1, 5.0, 5.0)], "pid bigint, x double, y double"
    )
    g_df = spark.createDataFrame(
        [(7, _quad_wkt(5, 5, 3)), (8, _quad_wkt(6, 6, 4))],
        "gid bigint, wkt string",
    )
    got = sorted(
        r["poly_gid"]
        for r in grid_spatial_join(p_df, g_df, cell_size=2.0).collect()
    )
    assert got == [7, 8]


def test_mega_polygon_guard(spark):
    p_df = spark.createDataFrame(
        [(1, 0.5, 0.5)], "pid bigint, x double, y double"
    )
    g_df = spark.createDataFrame(
        [(7, _quad_wkt(0, 0, 10_000.0))], "gid bigint, wkt string"
    )
    with pytest.raises(Exception, match="widen cell_size"):
        grid_spatial_join(
            p_df, g_df, cell_size=1.0, max_cells_per_polygon=100
        ).collect()


def test_radius_join_matches_naive(spark):
    rng = random.Random(31)
    a = [(i, rng.uniform(0, 50), rng.uniform(0, 50)) for i in range(200)]
    b = [(j, rng.uniform(0, 50), rng.uniform(0, 50)) for j in range(150)]
    from etl_sentinel_imagery_spark.operators.spatial_join import radius_join

    a_df = spark.createDataFrame(a, "aid bigint, x double, y double")
    b_df = spark.createDataFrame(b, "bid bigint, x double, y double")
    got = {
        (r["aid"], r["b_bid"])
        for r in radius_join(a_df, b_df, 3.0).collect()
    }
    want = {
        (ai, bi)
        for ai, ax, ay in a
        for bi, bx, by in b
        if ((ax - bx) ** 2 + (ay - by) ** 2) ** 0.5 <= 3.0
    }
    assert got == want and len(want) > 100
    # exactly-once: no duplicate candidate pairs survive
    rows = radius_join(a_df, b_df, 3.0).collect()
    assert len(rows) == len(got)


def test_radius_join_negative_coords_and_boundary(spark):
    from etl_sentinel_imagery_spark.operators.spatial_join import radius_join

    a_df = spark.createDataFrame(
        [(1, -5.0, -5.0)], "aid bigint, x double, y double"
    )
    b_df = spark.createDataFrame(
        [(7, -5.0, -8.0), (8, -5.0, -8.1)], "bid bigint, x double, y double"
    )
    got = {(r["aid"], r["b_bid"]) for r in radius_join(a_df, b_df, 3.0).collect()}
    assert got == {(1, 7)}  # dist 3.0 inclusive; 3.1 excluded
