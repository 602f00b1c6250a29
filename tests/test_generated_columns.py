"""GENERATED ALWAYS AS (expr) columns: declared post-hoc through the
property channel, computed by SQL INSERT when omitted, ENFORCED
(null-safe equality) when supplied — completing the column-facilities
triple beside GENERATED IDENTITY and DEFAULT."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_sentinel_imagery_spark.operators.txlog import (
    GeneratedColumnViolation,
    apply_generated_columns,
    drop_generated_column,
    init_table,
    resolve_generated_columns,
    set_column_default,
    set_generated_column,
    snapshot,
)
from etl_sentinel_imagery_spark.operators.txlog_sql import tx_sql


def _seed(spark):
    return spark.createDataFrame(
        [(1, 10, 100), (2, 20, 200)], "k int, v int, v10 int"
    )


def _rows(spark, d):
    return sorted(tuple(r) for r in snapshot(spark, d).collect())


def test_generated_compute_and_enforce(spark, tmp_path):
    d = str(tmp_path / "gen")
    init_table(spark, d, _seed(spark).coalesce(1))
    tables = {"t": d}
    tx_sql(
        spark,
        "ALTER TABLE t ALTER COLUMN v10 SET GENERATED ALWAYS AS "
        "(v * 10)",
        tables,
    )
    assert resolve_generated_columns(d) == {"v10": "v * 10"}

    # omitted → computed
    tx_sql(spark, "INSERT INTO t (k, v) VALUES (3, 30)", tables)
    assert (3, 30, 300) in _rows(spark, d)

    # supplied and CONSISTENT → accepted
    tx_sql(spark, "INSERT INTO t (k, v, v10) VALUES (4, 40, 400)", tables)
    assert (4, 40, 400) in _rows(spark, d)

    # supplied and WRONG → refused, nothing committed
    before = _rows(spark, d)
    with pytest.raises(GeneratedColumnViolation, match="v10"):
        tx_sql(
            spark,
            "INSERT INTO t (k, v, v10) VALUES (5, 50, 999)",
            tables,
        )
    assert _rows(spark, d) == before

    # DROP GENERATED: the column becomes plain (supplied values free)
    tx_sql(spark, "ALTER TABLE t ALTER COLUMN v10 DROP GENERATED", tables)
    tx_sql(spark, "INSERT INTO t (k, v, v10) VALUES (5, 50, 999)", tables)
    assert (5, 50, 999) in _rows(spark, d)


def test_generated_validation_and_default_exclusion(spark, tmp_path):
    d = str(tmp_path / "val")
    init_table(spark, d, _seed(spark).coalesce(1))
    # self-reference refuses (validated on schema MINUS the column)
    with pytest.raises(ValueError, match="other columns"):
        set_generated_column(spark, d, "v10", "v10 + 1")
    with pytest.raises(ValueError, match="not a column"):
        set_generated_column(spark, d, "nope", "v * 10")
    # default × generated are mutually exclusive, both directions
    set_generated_column(spark, d, "v10", "v * 10")
    with pytest.raises(ValueError, match="GENERATED ALWAYS AS"):
        set_column_default(spark, d, "v10", "7")
    drop_generated_column(d, "v10")
    set_column_default(spark, d, "v10", "7")
    with pytest.raises(ValueError, match="DEFAULT"):
        set_generated_column(spark, d, "v10", "v * 10")


def test_generated_python_helper_composes(spark, tmp_path):
    """The Python write path composes explicitly — the documented
    stance mirrors apply_column_defaults."""
    from etl_sentinel_imagery_spark.operators.txlog import append

    d = str(tmp_path / "pyg")
    init_table(spark, d, _seed(spark).coalesce(1))
    set_generated_column(spark, d, "v10", "v * 10")
    src = spark.createDataFrame([(7, 70)], "k int, v int")
    append(spark, d, apply_generated_columns(spark, d, src))
    assert (7, 70, 700) in _rows(spark, d)
    # nullable inputs: NULL v generates NULL v10, and a supplied NULL
    # matches under null-safe equality
    src2 = spark.createDataFrame(
        [(8, None, None)], "k int, v int, v10 int"
    )
    append(spark, d, apply_generated_columns(spark, d, src2))
    assert (8, None, None) in _rows(spark, d)


def test_identity_sql_route(spark, tmp_path):
    """The triple's third leg through SQL: SET GENERATED ALWAYS AS
    IDENTITY [START WITH n] enables the watermark, INSERT routes to
    the assigning append, and supplying the column refuses."""
    from etl_sentinel_imagery_spark.operators.txlog_sql import (
        TxSqlError,
    )

    d = str(tmp_path / "ident")
    init_table(
        spark, d,
        spark.createDataFrame([(10,), (20,)], "v int").coalesce(1),
    )
    tables = {"t": d}
    tx_sql(
        spark,
        "ALTER TABLE t ALTER COLUMN rid SET GENERATED ALWAYS AS "
        "IDENTITY START WITH 100",
        tables,
    )
    tx_sql(spark, "INSERT INTO t (v) VALUES (30), (40)", tables)
    rows = {
        (r["v"], r["rid"]) for r in snapshot(spark, d).collect()
    }
    assert {(30, 100), (40, 101)} <= rows or {
        (30, 101), (40, 100)
    } <= rows
    with pytest.raises(TxSqlError, match="GENERATED ALWAYS"):
        tx_sql(
            spark,
            "INSERT INTO t (v, rid) VALUES (50, 999)",
            tables,
        )
