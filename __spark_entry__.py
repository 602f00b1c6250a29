"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (the reference's selection-query
shape — SURVEY.md §7 step 1) on sf0.001. ``queries()`` / ``oracle_sql()``
expose the full operator battery from SURVEY.md §2; implementations live
in ``etl_sentinel_imagery_spark.queries``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from etl_sentinel_imagery_spark.plans.flagship import top_supplier_per_region
from etl_sentinel_imagery_spark.queries import oracle_sql as _oracle_sql
from etl_sentinel_imagery_spark.queries import queries as _queries
from etl_sentinel_imagery_spark.session import tune_session

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    tune_session(spark)
    return top_supplier_per_region(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    base = _queries()

    def _tuned(fn: Callable[[SparkSession, str], DataFrame]):
        def wrapper(spark: SparkSession, sf_dir: str) -> DataFrame:
            tune_session(spark)
            return fn(spark, sf_dir)

        return wrapper

    return {name: _tuned(fn) for name, fn in base.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL ground truth for each oracle-checkable query."""
    return _oracle_sql()
