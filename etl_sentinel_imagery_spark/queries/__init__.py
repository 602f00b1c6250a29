"""The named query battery exposed through __spark_entry__."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from etl_sentinel_imagery_spark.queries import (
    dml_q,
    events_q,
    relational,
    scalars,
    sentinel,
    spatial_q,
    sql_api,
    temporal_q,
    text_q,
    vectors_q,
)
from etl_sentinel_imagery_spark.queries.base import Q

# Domain (sentinel) queries lead: the driver's correctness gate reads the
# registry in this order, and reference-parity rows must never be the ones
# cut off if an external row cap exists (round-1 lesson: a 50-row window
# silently dropped every sentinel_* query registered last).
_MODULES = (
    sentinel,
    temporal_q,
    sql_api,
    dml_q,
    relational,
    scalars,
    spatial_q,
    events_q,
    text_q,
    vectors_q,
)


def all_queries() -> dict[str, Q]:
    out: dict[str, Q] = {}
    for m in _MODULES:
        overlap = out.keys() & m.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        out.update(m.QUERIES)
    return out


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.fn for name, q in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    return {name: q.sql for name, q in all_queries().items() if q.sql is not None}
