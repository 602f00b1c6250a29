"""The SQL DML front door (`operators/txlog_sql.py`): each statement
routes onto the existing transactional verb, and the post-state
equals the Python-verb twin bit-for-bit — MERGE clause grammar,
UPDATE, DELETE, INSERT, OPTIMIZE WHERE, VACUUM [DRY RUN], backtick
path references, alias rewriting, subquery sources (round-6 verdict
#2: the `USING txlog_table` view story closes round-trip)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from etl_sentinel_imagery_spark.operators.txlog import (
    append,
    current_version,
    delete_where,
    init_table,
    merge,
    snapshot,
    update_rows,
)
from etl_sentinel_imagery_spark.operators.txlog_sql import (
    TxSqlError,
    tx_sql,
)


def _seed(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"),
        (F.col("id") * 2).alias("v"),
        (F.col("id") % 3).cast("int").alias("grp"),
    )


def _rows(spark, d):
    return sorted(tuple(r) for r in snapshot(spark, d).collect())


def _twin(spark, tmp_path, name):
    """Two identical tables: one driven by SQL, one by the verb."""
    a, b = str(tmp_path / f"{name}_sql"), str(tmp_path / f"{name}_py")
    for d in (a, b):
        init_table(spark, d, _seed(spark, 0, 40).repartition(2))
    return a, b


def test_update_delete_insert_match_python_twins(spark, tmp_path):
    a, b = _twin(spark, tmp_path, "udi")
    t = {"tbl": a}

    tx_sql(spark, "UPDATE tbl SET v = v + 100 WHERE k < 10", t)
    update_rows(spark, b, "k < 10", {"v": "v + 100"})
    assert _rows(spark, a) == _rows(spark, b)

    # alias-qualified single-table form binds bare columns
    tx_sql(
        spark,
        "UPDATE tbl AS x SET x.v = x.v * 2 WHERE x.grp = 1 AND x.k > 30",
        t,
    )
    update_rows(spark, b, "grp = 1 AND k > 30", {"v": "v * 2"})
    assert _rows(spark, a) == _rows(spark, b)

    tx_sql(spark, "DELETE FROM tbl WHERE grp = 2 AND v >= 40;", t)
    delete_where(spark, b, "grp = 2 AND v >= 40")
    assert _rows(spark, a) == _rows(spark, b)

    tx_sql(
        spark,
        "INSERT INTO tbl SELECT id AS k, id * 2 AS v, "
        "CAST(id % 3 AS INT) AS grp FROM range(40, 50)",
        t,
    )
    append(spark, b, _seed(spark, 40, 50))
    assert _rows(spark, a) == _rows(spark, b)

    # VALUES form with a column alias
    tx_sql(
        spark,
        "INSERT INTO tbl VALUES (999, 1, CAST(0 AS INT)) AS r(k, v, grp)",
        t,
    )
    append(
        spark,
        b,
        spark.createDataFrame([(999, 1, 0)], "k long, v long, grp int"),
    )
    assert _rows(spark, a) == _rows(spark, b)


def test_merge_clause_grammar_matches_python_twin(spark, tmp_path):
    a, b = _twin(spark, tmp_path, "mg")
    src = spark.range(30, 55).select(
        F.col("id").alias("k"),
        (F.col("id") * 7).alias("v"),
        F.lit(1).cast("int").alias("grp"),
    )
    src.createOrReplaceTempView("mg_src")
    stmt = """
        MERGE INTO tbl AS tgt USING mg_src AS src ON tgt.k = src.k
        WHEN MATCHED AND src.k % 2 = 0 THEN UPDATE SET v = tgt.v + src.v
        WHEN MATCHED AND tgt.grp = 0 THEN DELETE
        WHEN MATCHED THEN UPDATE SET *
        WHEN NOT MATCHED AND src.k < 50 THEN INSERT *
    """
    tx_sql(spark, stmt, {"tbl": a})
    merge(
        spark,
        b,
        src,
        "k",
        when_matched=[
            ("update", "s.k % 2 = 0", {"v": "t.v + s.v"}),
            ("delete", "t.grp = 0"),
            ("update_all", None),
        ],
        when_not_matched=[("insert", "s.k < 50")],
    )
    assert _rows(spark, a) == _rows(spark, b)


def test_merge_subquery_source_and_backtick_path(spark, tmp_path):
    a, b = _twin(spark, tmp_path, "sq")
    _seed(spark, 0, 100).createOrReplaceTempView("sq_pool")
    # backtick-quoted directory instead of a tables mapping
    tx_sql(
        spark,
        f"MERGE INTO `{a}` t2 USING "
        "(SELECT k, v + 1 AS v, grp FROM sq_pool WHERE k >= 35) AS s2 "
        "ON t2.k = s2.k "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT *",
    )
    merge(
        spark,
        b,
        spark.sql("SELECT k, v + 1 AS v, grp FROM sq_pool WHERE k >= 35"),
        "k",
    )
    assert _rows(spark, a) == _rows(spark, b)


def test_optimize_and_vacuum_statements(spark, tmp_path):
    d = str(tmp_path / "opt")
    init_table(
        spark,
        d,
        _seed(spark, 0, 60).repartition(6),
        partition_cols=["grp"],
    )
    for lo in (60, 70, 80):
        append(spark, d, _seed(spark, lo, lo + 10).coalesce(1))
    t = {"tbl": d}
    # partition-scoped OPTIMIZE: only grp=1 leaves rewrite
    v, stats = tx_sql(spark, "OPTIMIZE tbl WHERE grp = 1", t)
    assert v == current_version(d)
    assert stats["files_rewritten"] > 0
    snap = _rows(spark, d)
    # full optimize on the rest via the twin check: statement == verb
    tx_sql(spark, "OPTIMIZE tbl", t)
    assert _rows(spark, d) == snap  # content-neutral
    # VACUUM DRY RUN reports, deletes nothing
    orphan = os.path.join(d, "grp=1", "orphan.parquet")
    with open(orphan, "wb") as f:
        f.write(b"x")
    would = tx_sql(spark, "VACUUM tbl RETAIN 0 HOURS DRY RUN", t)
    assert os.path.join("grp=1", "orphan.parquet") in would
    assert os.path.exists(orphan)
    gone = tx_sql(spark, "VACUUM tbl RETAIN 0 HOURS", t)
    assert os.path.join("grp=1", "orphan.parquet") in gone
    assert not os.path.exists(orphan)


def test_sql_roundtrip_with_txlog_table_view(spark, tmp_path):
    """The closing loop: DML through tx_sql, reads through the
    txlog_table SQL view — a pure-SQL user story."""
    from etl_sentinel_imagery_spark.sources.txlog_stream import register

    d = str(tmp_path / "loop")
    init_table(spark, d, _seed(spark, 0, 20).coalesce(1))
    tx_sql(spark, f"DELETE FROM `{d}` WHERE k % 5 = 0")
    tx_sql(spark, f"UPDATE `{d}` SET v = -1 WHERE k = 7")
    register(spark)
    spark.sql("DROP VIEW IF EXISTS loop_v")
    spark.sql(
        f"CREATE TEMPORARY VIEW loop_v USING txlog_table "
        f"OPTIONS (path '{d}')"
    )
    try:
        got = spark.sql(
            "SELECT count(*) AS n, sum(CASE WHEN v = -1 THEN 1 ELSE 0 "
            "END) AS flagged FROM loop_v"
        ).collect()[0]
        assert (got["n"], got["flagged"]) == (16, 1)
    finally:
        spark.sql("DROP VIEW IF EXISTS loop_v")


def test_unparseable_statements_raise(spark, tmp_path):
    d = str(tmp_path / "err")
    init_table(spark, d, _seed(spark, 0, 5).coalesce(1))
    t = {"tbl": d}
    with pytest.raises(TxSqlError, match="unsupported"):
        tx_sql(spark, "TRUNCATE TABLE tbl", t)
    with pytest.raises(TxSqlError, match="unknown table"):
        tx_sql(spark, "DELETE FROM ghost WHERE k = 1", {})
    with pytest.raises(TxSqlError, match="ON must"):
        tx_sql(
            spark,
            "MERGE INTO tbl t USING tbl s ON t.k = s.other "
            "WHEN MATCHED THEN DELETE",
            t,
        )
    with pytest.raises(TxSqlError, match="INSERT \\*"):
        tx_sql(
            spark,
            "MERGE INTO tbl t USING tbl s ON t.k = s.k "
            "WHEN NOT MATCHED THEN INSERT (k) VALUES (s.k)",
            t,
        )
    with pytest.raises(TxSqlError, match="SET"):
        tx_sql(spark, "UPDATE tbl WHERE k = 1", t)
