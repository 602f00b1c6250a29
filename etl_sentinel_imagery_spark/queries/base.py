"""Query registry plumbing for the driver contract.

Each named query is a (spark_fn, oracle_sql) pair: the Spark DataFrame
implementation and the ANSI-SQL ground truth DuckDB runs on the same
parquet tables. ``oracle_sql`` is the *semantic* oracle — it states the
right answer, it does not mirror the Spark implementation. Queries whose
semantics aren't SQL-expressible set ``sql=None`` (driver records a
rows-only check).

Column names are aliased identically on both sides — the driver sorts
columns by name before hashing values.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Q:
    fn: Callable[[SparkSession, str], DataFrame]
    sql: str | None = None
    doc: str = ""
