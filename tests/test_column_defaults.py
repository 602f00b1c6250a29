"""Column DEFAULT values (Delta parity): ALTER COLUMN c SET/DROP
DEFAULT stored in the table property map (versioned, checkpointed,
horizon-carried for free), applied by the SQL INSERT paths when the
column is omitted — absence-fallback, never a NULL-coalesce."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_sentinel_imagery_spark.operators.txlog import (
    drop_column_default,
    init_table,
    resolve_column_defaults,
    set_column_default,
    snapshot,
)
from etl_sentinel_imagery_spark.operators.txlog_sql import (
    TxSqlError,
    tx_sql,
)


def _seed(spark):
    return spark.createDataFrame(
        [(1, 10, "a"), (2, 20, "b")], "k int, v int, tag string"
    )


def _rows(spark, d):
    return sorted(tuple(r) for r in snapshot(spark, d).collect())


def test_insert_fills_omitted_columns_with_default(spark, tmp_path):
    d = str(tmp_path / "defaults")
    init_table(spark, d, _seed(spark).coalesce(1))
    tables = {"t": d}
    tx_sql(
        spark, "ALTER TABLE t ALTER COLUMN v SET DEFAULT 7 * 6", tables
    )
    tx_sql(
        spark,
        "ALTER TABLE t ALTER COLUMN tag SET DEFAULT upper('x')",
        tables,
    )
    assert resolve_column_defaults(d) == {
        "v": "7 * 6",
        "tag": "upper('x')",
    }
    # column-list INSERT omitting both defaulted columns
    tx_sql(spark, "INSERT INTO t (k) VALUES (3)", tables)
    # SELECT body with a column list
    tx_sql(spark, "INSERT INTO t (k, v) SELECT 4, 40", tables)
    assert _rows(spark, d) == [
        (1, 10, "a"),
        (2, 20, "b"),
        (3, 42, "X"),
        (4, 40, "X"),
    ]
    # a column PRESENT as NULL stays NULL — defaults are for absence
    tx_sql(
        spark,
        "INSERT INTO t (k, v, tag) VALUES "
        "(5, CAST(NULL AS INT), CAST(NULL AS STRING))",
        tables,
    )
    assert (5, None, None) in _rows(spark, d)

    # DROP DEFAULT: omission goes back to NULL
    tx_sql(spark, "ALTER TABLE t ALTER COLUMN v DROP DEFAULT", tables)
    tx_sql(spark, "INSERT INTO t (k) VALUES (6)", tables)
    assert (6, None, "X") in _rows(spark, d)


def test_insert_overwrite_applies_defaults(spark, tmp_path):
    d = str(tmp_path / "ovw")
    init_table(spark, d, _seed(spark).coalesce(1))
    tables = {"t": d}
    set_column_default(spark, d, "tag", "'filled'")
    tx_sql(
        spark,
        "INSERT OVERWRITE t (k, v) VALUES (9, 90), (8, 80)",
        tables,
    )
    assert _rows(spark, d) == [(8, 80, "filled"), (9, 90, "filled")]


def test_default_validation_refuses_bad_expressions(spark, tmp_path):
    d = str(tmp_path / "val")
    init_table(spark, d, _seed(spark).coalesce(1))
    with pytest.raises(ValueError, match="not a column"):
        set_column_default(spark, d, "nope", "1")
    # column references are not self-contained
    with pytest.raises(ValueError, match="self-contained"):
        set_column_default(spark, d, "v", "k + 1")
    with pytest.raises(ValueError, match="self-contained"):
        set_column_default(spark, d, "v", "not ( valid sql")
    # a valid default still enforces constraints on the final rows
    from etl_sentinel_imagery_spark.operators.txlog import (
        add_constraint,
    )

    add_constraint(spark, d, "v_pos", "v > 0")
    set_column_default(spark, d, "v", "-5")
    with pytest.raises(Exception, match="v_pos"):
        tx_sql(spark, "INSERT INTO t (k) VALUES (7)", {"t": d})


def test_defaults_are_versioned_metadata(spark, tmp_path):
    """The property channel gives versioned resolution for free: the
    default in force at an old version resolves from that version."""
    d = str(tmp_path / "ver")
    init_table(spark, d, _seed(spark).coalesce(1))
    v1 = set_column_default(spark, d, "v", "1")
    v2 = set_column_default(spark, d, "v", "2")
    assert resolve_column_defaults(d, v1) == {"v": "1"}
    assert resolve_column_defaults(d, v2) == {"v": "2"}
    drop_column_default(d, "v")
    assert resolve_column_defaults(d) == {}


def test_python_append_keeps_null_fill(spark, tmp_path):
    """The Python verb's documented stance is unchanged: a DataFrame
    append missing a defaulted column NULL-fills (Delta's own
    DataFrame writes behave the same); only SQL INSERT applies
    defaults."""
    from etl_sentinel_imagery_spark.operators.txlog import append

    d = str(tmp_path / "pyappend")
    init_table(spark, d, _seed(spark).coalesce(1))
    set_column_default(spark, d, "tag", "'dflt'")
    append(
        spark, d,
        spark.createDataFrame([(9, 90)], "k int, v int"),
    )
    assert (9, 90, None) in _rows(spark, d)


def test_alter_grammar_errors(spark, tmp_path):
    d = str(tmp_path / "gram")
    init_table(spark, d, _seed(spark).coalesce(1))
    with pytest.raises(TxSqlError, match="ALTER TABLE supports"):
        tx_sql(spark, "ALTER TABLE t ALTER COLUMN v", {"t": d})


def test_describe_detail_surfaces_column_facilities(spark, tmp_path):
    """DESCRIBE DETAIL lists defaults / generated / identity
    declarations in one place (round-10)."""
    from etl_sentinel_imagery_spark.operators.txlog import (
        enable_identity,
        set_generated_column,
        table_details,
    )

    d = str(tmp_path / "detail")
    init_table(
        spark, d,
        spark.createDataFrame(
            [(1, 10, 100)], "k int, v int, v10 int"
        ).coalesce(1),
    )
    set_column_default(spark, d, "v", "7")
    set_generated_column(spark, d, "v10", "v * 10")
    enable_identity(d, "rid")
    det = table_details(d)
    assert det["column_defaults"] == {"v": "7"}
    assert det["generated_columns"] == {"v10": "v * 10"}
    assert det["identity_columns"] == ["rid"]
