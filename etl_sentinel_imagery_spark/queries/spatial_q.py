"""Strict-hash oracle battery for the scale spatial joins + the fuzzy
string join (consolidated here from scalars.fuzzy_name_pairs to hold
the 50-row registry).

Three "block then exact-verify" join shapes share one schema
(kind, a, b, metric):

- ``pip``: grid_spatial_join (operators.spatial_join) — every point
  from `part` against concave, hole-bearing L-polygons derived from
  `nation`, verified by the even-odd kernel. The DuckDB oracle restates
  even-odd crossing counting from first principles over an exploded
  ring-edge table — a fully independent formulation (no grid, no
  bbox, no python). Reference anchor: the spatial-predicate semantics
  of imagery_store.py:185 (OData intersects), generalized to the
  many×many shape.
- ``radius``: radius_join (ST_DWithin) — suppliers × customers within
  euclidean distance 5; oracle is the O(n·m) cross-join distance
  filter (sf-capped, exact).
- ``fuzzy``: Levenshtein block-join over distinct part names (the
  former fuzzy_name_pairs row, unchanged semantics).

Cross-engine exactness is engineered, not hoped for: every coordinate
is a small binary fraction (integers + 1/2 or 1/4), polygon edges are
axis-parallel or slope ±2, and a short proof in comments shows no
point can lie on any edge — so both engines compute the same
mathematical booleans regardless of formulation, and distances² are
exact integers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_sentinel_imagery_spark.operators.spatial_join import (
    grid_spatial_join,
    radius_join,
)
from etl_sentinel_imagery_spark.queries.base import Q
from etl_sentinel_imagery_spark.queries.scalars import _fuzzy_name_pairs
from etl_sentinel_imagery_spark.sources.tables import load_table

# L-shaped outer ring (concave, one slope-(-2) bevel edge) anchored at
# a nation's 20x20 grid cell; even nations carry a square hole.
# On-edge impossibility: points sit at (int + 1/2, int + 1/4). Vertical
# edges have integer x (distance 1/2); horizontal edges never straddle
# a ray at y = int + 1/4; the bevel edge (dx/dy = -1/2) crosses
# y = q + 1/4 at x = x1 - q'/2 - 1/8, whose fractional part is in
# {1/8, 3/8, 5/8, 7/8} — never 1/2. All quantities are exact binary
# fractions, so the crossing tests are bit-deterministic on any
# IEEE-754 engine and in any algebraic formulation.
_OUTER = [(0, 0), (12, 0), (9, 6), (6, 6), (6, 12), (0, 12), (0, 0)]
_HOLE = [(2, 2), (4, 2), (4, 4), (2, 4), (2, 2)]


def _ring_sql(pts) -> str:
    return ", ".join(f"({x1},{y1},{x2},{y2})" for (x1, y1), (x2, y2) in zip(pts, pts[1:]))


def _points_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        ((F.col("p_partkey") * 7) % 100 + F.lit(0.5)).alias("x"),
        ((F.col("p_partkey") * 13) % 100 + F.lit(0.25)).alias("y"),
    )


def _polys_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation")
    ax = (F.col("n_nationkey") % 5) * 20
    ay = F.floor(F.col("n_nationkey") / 5) * 20

    def ring(pts) -> F.Column:
        return F.concat(
            F.lit("("),
            F.concat_ws(
                ", ",
                *[
                    F.format_string("%d %d", (ax + x).cast("long"), (ay + y).cast("long"))
                    for x, y in pts
                ],
            ),
            F.lit(")"),
        )

    wkt = F.concat(
        F.lit("POLYGON("),
        ring(_OUTER),
        F.when(F.col("n_nationkey") % 2 == 0, F.concat(F.lit(", "), ring(_HOLE))).otherwise(F.lit("")),
        F.lit(")"),
    )
    return nation.select("n_nationkey", wkt.alias("wkt"))


def _radius_points(spark: SparkSession, sf_dir: str):
    sup = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey",
        ((F.col("s_suppkey") * 11) % 100 + F.lit(0.5)).alias("x"),
        ((F.col("s_suppkey") * 17) % 100 + F.lit(0.5)).alias("y"),
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        ((F.col("c_custkey") * 3) % 100 + F.lit(0.5)).alias("x"),
        ((F.col("c_custkey") * 19) % 100 + F.lit(0.5)).alias("y"),
    )
    return sup, cust


def _battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    pip = grid_spatial_join(
        _points_df(spark, sf_dir),
        _polys_df(spark, sf_dir),
        cell_size=8.0,
    ).select(
        F.lit("pip").alias("kind"),
        F.col("p_partkey").cast("string").alias("a"),
        F.col("poly_n_nationkey").cast("string").alias("b"),
        F.lit(0).cast("bigint").alias("metric"),
    )
    sup, cust = _radius_points(spark, sf_dir)
    rad = radius_join(sup, cust, radius=5.0).select(
        F.lit("radius").alias("kind"),
        F.col("s_suppkey").cast("string").alias("a"),
        F.col("b_c_custkey").cast("string").alias("b"),
        # dx/dy are exact integers by construction -> d2 is an exact
        # integer in doubles; carried as the hashable metric
        (
            (F.col("x") - F.col("b_x")) * (F.col("x") - F.col("b_x"))
            + (F.col("y") - F.col("b_y")) * (F.col("y") - F.col("b_y"))
        )
        .cast("bigint")
        .alias("metric"),
    )
    fuzzy = _fuzzy_name_pairs(spark, sf_dir).select(
        F.lit("fuzzy").alias("kind"),
        F.col("name_a").alias("a"),
        F.col("name_b").alias("b"),
        F.col("edit_dist").cast("bigint").alias("metric"),
    )
    return pip.unionByName(rad).unionByName(fuzzy)


_BATTERY_SQL = f"""
WITH pts AS (
  SELECT p_partkey,
         (p_partkey * 7) % 100 + 0.5 AS x,
         (p_partkey * 13) % 100 + 0.25 AS y
  FROM part
), poly AS (
  SELECT n_nationkey,
         (n_nationkey % 5) * 20 AS ax,
         (n_nationkey // 5) * 20 AS ay
  FROM nation
), edges AS (
  SELECT n_nationkey, ax + ex1 AS x1, ay + ey1 AS y1,
         ax + ex2 AS x2, ay + ey2 AS y2
  FROM poly, (VALUES {_ring_sql(_OUTER)}) AS e(ex1, ey1, ex2, ey2)
  UNION ALL
  SELECT n_nationkey, ax + ex1, ay + ey1, ax + ex2, ay + ey2
  FROM poly, (VALUES {_ring_sql(_HOLE)}) AS h(ex1, ey1, ex2, ey2)
  WHERE n_nationkey % 2 = 0
), crossings AS (
  -- even-odd from first principles: a rightward ray from the point
  -- crosses an odd number of (outer+hole) edges iff the point is
  -- inside the outer ring and outside the hole
  SELECT p.p_partkey, e.n_nationkey,
         COUNT(*) FILTER (
           WHERE (e.y1 > p.y) <> (e.y2 > p.y)
             AND e.y1 <> e.y2
             AND p.x < e.x1 + (p.y - e.y1) * (e.x2 - e.x1) / (e.y2 - e.y1)
         ) AS k
  FROM pts p CROSS JOIN edges e
  GROUP BY 1, 2
), names AS (SELECT DISTINCT p_name FROM part)
SELECT 'pip' AS kind, CAST(p_partkey AS VARCHAR) AS a,
       CAST(n_nationkey AS VARCHAR) AS b, CAST(0 AS BIGINT) AS metric
FROM crossings WHERE k % 2 = 1
UNION ALL
SELECT 'radius', CAST(s.s_suppkey AS VARCHAR), CAST(c.c_custkey AS VARCHAR),
       CAST((sx - cx) * (sx - cx) + (sy - cy) * (sy - cy) AS BIGINT)
FROM (SELECT s_suppkey, (s_suppkey * 11) % 100 + 0.5 AS sx,
             (s_suppkey * 17) % 100 + 0.5 AS sy FROM supplier) s
CROSS JOIN (SELECT c_custkey, (c_custkey * 3) % 100 + 0.5 AS cx,
                   (c_custkey * 19) % 100 + 0.5 AS cy FROM customer) c
WHERE (sx - cx) * (sx - cx) + (sy - cy) * (sy - cy) <= 25
UNION ALL
SELECT 'fuzzy', a.p_name, b.p_name,
       CAST(levenshtein(a.p_name, b.p_name) AS BIGINT)
FROM names a
JOIN names b
  ON string_split(a.p_name, ' ')[1] = string_split(b.p_name, ' ')[1]
 AND a.p_name < b.p_name
WHERE levenshtein(a.p_name, b.p_name) <= 4
"""


QUERIES: dict[str, Q] = {
    "spatial_fuzzy_join_battery": Q(
        _battery,
        _BATTERY_SQL,
        "grid point-in-polygon + radius (ST_DWithin) + Levenshtein joins "
        "vs a from-first-principles even-odd / cross-join oracle",
    ),
}
