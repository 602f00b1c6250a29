"""Spark SQL API surface: views, CTEs, correlated subqueries.

SURVEY.md §2.10 lists SQL parsing/views/subqueries/CTEs as machinery the
reference lacks and Spark provides; this battery exercises that surface
through ``spark.sql`` over registered temp views (the engine's second
front door — same Catalyst plans as the DataFrame API). Two formerly
standalone rows fold into one tagged battery (the round-6 fold pattern,
freeing a registry slot for the DML/txlog oracle row):

- ``small_qty_revenue`` — TPC-H Q17 shape, decorrelated CTE form;
- ``above_nation_avg`` — correlated scalar subquery Catalyst
  decorrelates into a join.

Determinism note for the correlated threshold: the per-group average is
computed as CAST(SUM(decimal) AS DOUBLE) / COUNT(*) — exact accumulation,
then an identical two-op float sequence in both engines, so the 0.2×avg
cutoff is bit-identical and boundary rows can't flip.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from etl_sentinel_imagery_spark.queries.base import Q
from etl_sentinel_imagery_spark.sources.tables import register_views

_SQL_API_BATTERY = """
WITH thresholds AS (
    SELECT l_partkey AS tk,
           (CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) / COUNT(*)) * 0.2
               AS qty_cutoff
    FROM lineitem
    GROUP BY l_partkey
),
small AS (
    SELECT 'small_qty_revenue' AS case_name,
           l.l_partkey AS k,
           COUNT(*) AS n,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
               AS val
    FROM lineitem l
    JOIN thresholds t ON l.l_partkey = t.tk
    WHERE l.l_quantity < t.qty_cutoff
    GROUP BY 2
),
above AS (
    SELECT 'above_nation_avg' AS case_name,
           c_custkey AS k,
           CAST(NULL AS BIGINT) AS n,
           c_acctbal AS val
    FROM customer c
    WHERE c_acctbal > (
        SELECT (CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                / COUNT(*))
        FROM customer c2
        WHERE c2.c_nationkey = c.c_nationkey
    )
)
SELECT * FROM small
UNION ALL
SELECT * FROM above
"""


def _sql_api_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CTE + threshold join (Q17 shape) and a correlated scalar
    subquery, one tagged relation; the SAME SQL text runs on DuckDB."""
    register_views(spark, sf_dir)
    return spark.sql(_SQL_API_BATTERY)


QUERIES: dict[str, Q] = {
    "sql_api_battery": Q(
        _sql_api_battery,
        _SQL_API_BATTERY,
        "CTE + threshold join (Q17 shape) + correlated scalar subquery",
    ),
}
