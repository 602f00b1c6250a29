"""Spark SQL API surface: views, CTEs, correlated subqueries.

SURVEY.md §2.10 lists SQL parsing/views/subqueries/CTEs as machinery the
reference lacks and Spark provides; these queries exercise that surface
through ``spark.sql`` over registered temp views (the engine's second
front door — same Catalyst plans as the DataFrame API).

Determinism note for the correlated threshold: the per-group average is
computed as CAST(SUM(decimal) AS DOUBLE) / COUNT(*) — exact accumulation,
then an identical two-op float sequence in both engines, so the 0.2×avg
cutoff is bit-identical and boundary rows can't flip.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from etl_sentinel_imagery_spark.queries.base import Q
from etl_sentinel_imagery_spark.sources.tables import register_views

_SMALL_QTY_SQL = """
WITH thresholds AS (
    SELECT l_partkey AS tk,
           (CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) / COUNT(*)) * 0.2
               AS qty_cutoff
    FROM lineitem
    GROUP BY l_partkey
)
SELECT l.l_partkey AS partkey,
       COUNT(*) AS n_small,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS small_revenue
FROM lineitem l
JOIN thresholds t ON l.l_partkey = t.tk
WHERE l.l_quantity < t.qty_cutoff
GROUP BY 1
"""


def _small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape (decorrelated CTE form) through spark.sql."""
    register_views(spark, sf_dir)
    return spark.sql(_SMALL_QTY_SQL)


_CORRELATED_SQL = """
SELECT c_custkey, c_name, c_acctbal
FROM customer c
WHERE c_acctbal > (
    SELECT (CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*))
    FROM customer c2
    WHERE c2.c_nationkey = c.c_nationkey
)
"""


def _above_nation_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery — Catalyst decorrelates it into a join."""
    register_views(spark, sf_dir)
    return spark.sql(_CORRELATED_SQL)


QUERIES: dict[str, Q] = {
    "sql_small_quantity_revenue": Q(
        _small_quantity_revenue, _SMALL_QTY_SQL, "CTE + threshold join (Q17 shape)"
    ),
    "sql_above_nation_avg": Q(
        _above_nation_avg, _CORRELATED_SQL, "correlated scalar subquery"
    ),
}
