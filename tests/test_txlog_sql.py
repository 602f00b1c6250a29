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
        tx_sql(spark, "DROP TABLE tbl", t)
    with pytest.raises(TxSqlError, match="unknown table"):
        tx_sql(spark, "DELETE FROM ghost WHERE k = 1", {})
    # unparsed junk must never silently become a full delete
    with pytest.raises(TxSqlError, match="unexpected tokens"):
        tx_sql(spark, "DELETE FROM tbl x USING other", t)
    assert snapshot(spark, d).count() == 5  # untouched
    with pytest.raises(TxSqlError, match="ON must"):
        tx_sql(
            spark,
            "MERGE INTO tbl t USING tbl s ON t.k = s.other "
            "WHEN MATCHED THEN DELETE",
            t,
        )
    # composite equi-keys are legal since round 9; a non-equi
    # conjunct (range, expression) is still not a keyed merge
    with pytest.raises(TxSqlError, match="conjunctive equi-keys"):
        tx_sql(
            spark,
            "MERGE INTO tbl a USING tbl b "
            "ON a.k = b.k AND a.grp < b.grp "
            "WHEN MATCHED THEN DELETE",
            t,
        )
    with pytest.raises(TxSqlError, match="duplicate MERGE ON key"):
        tx_sql(
            spark,
            "MERGE INTO tbl a USING tbl b "
            "ON a.k = b.k AND a.k = b.k "
            "WHEN MATCHED THEN DELETE",
            t,
        )
    with pytest.raises(TxSqlError, match="INSERT"):
        tx_sql(
            spark,
            "MERGE INTO tbl a USING tbl b ON a.k = b.k "
            "WHEN NOT MATCHED THEN INSERT ROW",
            t,
        )
    with pytest.raises(TxSqlError, match="arity"):
        tx_sql(
            spark,
            "MERGE INTO tbl a USING tbl b ON a.k = b.k "
            "WHEN NOT MATCHED THEN INSERT (k, v) VALUES (b.k)",
            t,
        )
    with pytest.raises(TxSqlError, match="target only"):
        tx_sql(
            spark,
            "MERGE INTO tbl a USING tbl b ON a.k = b.k "
            "WHEN NOT MATCHED BY SOURCE AND b.v > 0 THEN DELETE",
            t,
        )
    with pytest.raises(TxSqlError, match="SET"):
        tx_sql(spark, "UPDATE tbl WHERE k = 1", t)


def test_merge_alias_collision_binds_correctly(spark, tmp_path):
    """Round-7 verdict #1: a target aliased `s` / source aliased `t`
    must not have its conditions silently re-bound by the sequential
    alias rewrite (`s.v < t.v` became `s.v < s.v`). The statement's
    post-state must equal the Python-verb twin with the ASYMMETRIC
    condition intact."""
    a, b = _twin(spark, tmp_path, "collide")
    src = spark.range(20, 50).select(
        F.col("id").alias("k"),
        # source v DIFFERS from target v (target: k*2; source: k*2+1
        # for even k only) so an asymmetric condition distinguishes
        (F.col("id") * 2 + (F.col("id") % 2)).alias("v"),
        F.lit(9).cast("int").alias("grp"),
    )
    src.createOrReplaceTempView("collide_src")
    # engine-reserved names swapped: target AS s, source AS t
    tx_sql(
        spark,
        """
        MERGE INTO tbl AS s USING collide_src AS t ON s.k = t.k
        WHEN MATCHED AND s.v < t.v THEN UPDATE SET v = t.v + s.v
        WHEN MATCHED THEN DELETE
        WHEN NOT MATCHED AND t.k < 45 THEN INSERT *
        """,
        {"tbl": a},
    )
    merge(
        spark,
        b,
        src,
        "k",
        when_matched=[
            ("update", "t.v < s.v", {"v": "s.v + t.v"}),
            ("delete", None),
        ],
        when_not_matched=[("insert", "s.k < 45")],
    )
    rows_a, rows_b = _rows(spark, a), _rows(spark, b)
    assert rows_a == rows_b
    # the asymmetric condition actually fired both ways: odd source
    # keys updated (target.v < source.v), even ones deleted
    assert any(r[1] == 4 * r[0] + 1 for r in rows_a)  # summed update
    live_keys = {r[0] for r in rows_a}
    assert all(k not in live_keys for k in range(20, 40, 2))


def test_merge_insert_column_list(spark, tmp_path):
    """WHEN NOT MATCHED THEN INSERT (cols) VALUES (exprs): listed
    columns bind the exprs, unlisted columns insert NULL, and the
    post-state equals the engine's sets-insert twin."""
    a, b = _twin(spark, tmp_path, "inscols")
    src = _seed(spark, 35, 60)
    src.createOrReplaceTempView("inscols_src")
    tx_sql(
        spark,
        "MERGE INTO tbl t USING inscols_src s ON t.k = s.k "
        "WHEN NOT MATCHED AND s.k < 55 THEN "
        "INSERT (k, v) VALUES (s.k, s.v * 10)",
        {"tbl": a},
    )
    merge(
        spark,
        b,
        src,
        "k",
        when_matched=[],
        when_not_matched=[
            ("insert", "s.k < 55", {"k": "s.k", "v": "s.v * 10"})
        ],
    )
    rows_a = _rows(spark, a)
    assert rows_a == _rows(spark, b)
    inserted = [r for r in rows_a if r[0] >= 40]
    assert inserted and all(
        r[1] == r[0] * 20 and r[2] is None for r in inserted
    )
    assert max(r[0] for r in rows_a) == 54  # clause condition held


def test_merge_not_matched_by_source(spark, tmp_path):
    """WHEN NOT MATCHED BY SOURCE DELETE / UPDATE SET: target rows
    without a source match route through the new engine leg; first
    clause wins; post-state equals the Python-verb twin."""
    a, b = _twin(spark, tmp_path, "bysrc")
    src = _seed(spark, 10, 30)
    src.createOrReplaceTempView("bysrc_src")
    stmt = """
        MERGE INTO tbl t USING bysrc_src s ON t.k = s.k
        WHEN MATCHED THEN UPDATE SET v = s.v + 1
        WHEN NOT MATCHED THEN INSERT *
        WHEN NOT MATCHED BY SOURCE AND t.k < 5 THEN DELETE
        WHEN NOT MATCHED BY SOURCE THEN UPDATE SET v = -t.v
    """
    tx_sql(spark, stmt, {"tbl": a})
    merge(
        spark,
        b,
        src,
        "k",
        when_matched=[("update", None, {"v": "s.v + 1"})],
        when_not_matched=[("insert", None)],
        when_not_matched_by_source=[
            ("delete", "t.k < 5"),
            ("update", None, {"v": "-t.v"}),
        ],
    )
    rows_a = _rows(spark, a)
    assert rows_a == _rows(spark, b)
    keys = {r[0]: r[1] for r in rows_a}
    assert all(k not in keys for k in range(0, 5))  # deleted
    assert all(keys[k] == -(k * 2) for k in range(5, 10))  # negated
    assert all(keys[k] == k * 2 + 1 for k in range(10, 30))  # matched


def test_insert_values_positional_binding_and_guard(spark, tmp_path):
    """ADVICE round 7: unaliased VALUES must never silently
    schema-evolve. Arity-matching tuples bind positionally onto the
    table schema; mismatches raise; explicit column lists work for
    both VALUES and SELECT bodies."""
    d = str(tmp_path / "valguard")
    init_table(spark, d, _seed(spark, 0, 5).coalesce(1))
    t = {"tbl": d}
    cols_before = snapshot(spark, d).columns

    # positional: arity matches the table → binds k, v, grp
    tx_sql(spark, "INSERT INTO tbl VALUES (100, 200, 1)", t)
    snap = snapshot(spark, d)
    assert snap.columns == cols_before  # NOT evolved
    got = snap.filter("k = 100").collect()
    assert [(r["v"], r["grp"]) for r in got] == [(200, 1)]

    # arity mismatch without names → loud refusal, table untouched
    with pytest.raises(TxSqlError, match="column names"):
        tx_sql(spark, "INSERT INTO tbl VALUES (101, 201)", t)
    assert snapshot(spark, d).filter("k = 101").count() == 0

    # explicit column list + VALUES: unlisted columns NULL via
    # append's by-name merge
    tx_sql(spark, "INSERT INTO tbl (k, v) VALUES (102, 202)", t)
    got = snapshot(spark, d).filter("k = 102").collect()
    assert [(r["v"], r["grp"]) for r in got] == [(202, None)]

    # explicit column list + SELECT: positional rename
    tx_sql(
        spark,
        "INSERT INTO tbl (grp, k) SELECT CAST(7 AS INT), id "
        "FROM range(103, 105)",
        t,
    )
    got = sorted(
        (r["k"], r["grp"])
        for r in snapshot(spark, d).filter("k >= 103").collect()
    )
    assert got == [(103, 7), (104, 7)]

    # column-list arity mismatch raises
    with pytest.raises(TxSqlError, match="arity"):
        tx_sql(spark, "INSERT INTO tbl (k, v, grp) VALUES (1, 2)", t)

    # ADVICE round 8: a typo'd column name in the explicit list must
    # refuse, not silently schema-evolve through the positional toDF
    # rename + append's by-name merge (same hazard, other entrance)
    with pytest.raises(TxSqlError, match="unknown columns"):
        tx_sql(spark, "INSERT INTO tbl (k, vv) VALUES (150, 250)", t)
    with pytest.raises(TxSqlError, match="unknown columns"):
        tx_sql(
            spark,
            "INSERT INTO tbl (k, vlaue) "
            "SELECT id, id FROM range(150, 153)",
            t,
        )
    snap = snapshot(spark, d)
    assert snap.columns == cols_before  # still NOT evolved
    assert snap.filter("k >= 150").count() == 0  # nothing landed


def test_parser_quoted_parens_and_case_when(spark, tmp_path):
    """ADVICE round 7 (low): a quoted ')' inside a subquery source
    must not split the paren scan, and a CASE WHEN inside a clause
    condition must not be mistaken for a new merge clause."""
    a, b = _twin(spark, tmp_path, "quoted")
    _seed(spark, 30, 45).withColumn(
        "tag", F.concat(F.lit("x)"), F.col("k").cast("string"))
    ).createOrReplaceTempView("quoted_pool")
    tx_sql(
        spark,
        "MERGE INTO tbl t USING "
        "(SELECT k, v, grp FROM quoted_pool WHERE tag != ')' "
        "AND k < 42) s ON t.k = s.k "
        "WHEN MATCHED AND (CASE WHEN s.grp = 0 THEN true ELSE false "
        "END) THEN UPDATE SET v = s.v + 1000 "
        "WHEN NOT MATCHED THEN INSERT *",
        {"tbl": a},
    )
    merge(
        spark,
        b,
        spark.sql(
            "SELECT k, v, grp FROM quoted_pool "
            "WHERE tag != ')' AND k < 42"
        ),
        "k",
        when_matched=[
            ("update", "s.grp = 0", {"v": "s.v + 1000"}),
        ],
        when_not_matched=[("insert", None)],
    )
    assert _rows(spark, a) == _rows(spark, b)


def test_ddl_and_lifecycle_statements(spark, tmp_path):
    """Round-8 extension: the remaining daily-driver statements route
    onto their verbs — CREATE TABLE AS (partitioned), TRUNCATE,
    RESTORE TO VERSION AS OF, ALTER TABLE (TBLPROPERTIES, CONSTRAINT,
    RENAME/DROP COLUMN), DESCRIBE HISTORY/DETAIL — each checked
    against the Python-verb behavior."""
    from etl_sentinel_imagery_spark.operators.txlog import (
        resolve_constraints,
        resolve_properties,
    )

    d = str(tmp_path / "ddl")
    t = {"tbl": d}
    _seed(spark, 0, 30).createOrReplaceTempView("ddl_pool")
    v0 = tx_sql(
        spark,
        "CREATE TABLE tbl PARTITIONED BY (grp) AS "
        "SELECT * FROM ddl_pool",
        t,
    )
    assert v0 == 0
    assert sorted(snapshot(spark, d).columns) == ["grp", "k", "v"]
    assert snapshot(spark, d).count() == 30
    # hive layout: partition dirs exist
    assert os.path.isdir(os.path.join(d, "grp=0"))

    tx_sql(
        spark,
        "ALTER TABLE tbl SET TBLPROPERTIES "
        "('retention.min_age_seconds' = 0, 'team' = 'curation')",
        t,
    )
    props = resolve_properties(d, current_version(d))
    assert props["retention.min_age_seconds"] == 0
    assert props["team"] == "curation"
    tx_sql(spark, "ALTER TABLE tbl UNSET TBLPROPERTIES ('team')", t)
    assert "team" not in resolve_properties(d, current_version(d))

    tx_sql(
        spark, "ALTER TABLE tbl ADD CONSTRAINT k_pos CHECK (k >= 0)", t
    )
    assert resolve_constraints(d, current_version(d)) == {
        "k_pos": "k >= 0"
    }
    # enforced: an insert violating it refuses
    with pytest.raises(Exception, match="k_pos"):
        tx_sql(
            spark,
            "INSERT INTO tbl VALUES (-1, 0, CAST(0 AS INT)) "
            "AS r(k, v, grp)",
            t,
        )
    tx_sql(spark, "ALTER TABLE tbl DROP CONSTRAINT k_pos", t)
    assert resolve_constraints(d, current_version(d)) == {}

    tx_sql(spark, "ALTER TABLE tbl RENAME COLUMN v TO val", t)
    assert "val" in snapshot(spark, d).columns
    tx_sql(spark, "ALTER TABLE tbl DROP COLUMN val", t)
    assert sorted(snapshot(spark, d).columns) == ["grp", "k"]

    v_before = current_version(d)
    tx_sql(spark, "TRUNCATE TABLE tbl", t)
    assert snapshot(spark, d).count() == 0
    tx_sql(
        spark, f"RESTORE TABLE tbl TO VERSION AS OF {v_before}", t
    )
    assert snapshot(spark, d).count() == 30

    hist = tx_sql(spark, "DESCRIBE HISTORY tbl", t)
    assert hist[0]["version"] == 0
    assert any("restore" in h["op"] for h in hist)
    det = tx_sql(spark, "DESCRIBE DETAIL tbl", t)
    assert det["n_files"] >= 1 and det["live_rows"] == 30

    tx_sql(spark, "ALTER TABLE tbl ADD COLUMN score DOUBLE", t)
    snap = snapshot(spark, d)
    assert dict(snap.dtypes)["score"] == "double"
    # existing files serve the new column NULL-filled, no data touched
    assert snap.filter("score IS NULL").count() == 30
    tx_sql(
        spark,
        "INSERT INTO tbl VALUES (500, CAST(0 AS INT), "
        "CAST(1.5 AS DOUBLE)) AS r(k, grp, score)",
        t,
    )
    got = snapshot(spark, d).filter("k = 500").collect()
    assert [r["score"] for r in got] == [1.5]

    # OPTIMIZE ZORDER BY routes to the full-relayout verb and is
    # content-neutral
    before = sorted(
        tuple(r) for r in snapshot(spark, d).fillna(-1).collect()
    )
    tx_sql(spark, "OPTIMIZE tbl ZORDER BY (k)", t)
    assert sorted(
        tuple(r) for r in snapshot(spark, d).fillna(-1).collect()
    ) == before

    # round-10: the (col type) schema form is SUPPORTED — an empty
    # table with a recorded schema, writable from v0
    tx_sql(
        spark, "CREATE TABLE t2 (k BIGINT)",
        {"t2": str(tmp_path / "t2")},
    )
    assert snapshot(spark, str(tmp_path / "t2")).count() == 0
    with pytest.raises(TxSqlError, match="AS <select>"):
        tx_sql(spark, "CREATE TABLE t3", {"t3": str(tmp_path / "t3")})
    with pytest.raises(TxSqlError, match="ALTER TABLE supports"):
        tx_sql(spark, "ALTER TABLE tbl CHANGE COLUMN z z INT", t)


def test_insert_overwrite_full_and_partition(spark, tmp_path):
    """INSERT OVERWRITE: one atomic commit replaces the table (or one
    hive leaf under the replaceWhere contract); time travel to the
    pre-overwrite version stays exact; stray rows outside the named
    partition refuse; schema never evolves."""
    from etl_sentinel_imagery_spark.operators.txlog import (
        overwrite_table,
    )

    d = str(tmp_path / "ovw")
    init_table(
        spark,
        d,
        _seed(spark, 0, 30).repartition(3),
        partition_cols=["grp"],
    )
    t = {"tbl": d}
    v_before = current_version(d)

    # partition-scoped: only grp=1 rows replaced, others untouched
    tx_sql(
        spark,
        "INSERT OVERWRITE tbl PARTITION (grp = 1) "
        "SELECT id AS k, -id AS v, CAST(1 AS INT) AS grp "
        "FROM range(1000, 1005)",
        t,
    )
    rows = _rows(spark, d)
    g1 = [r for r in rows if r[2] == 1]
    assert sorted(r[0] for r in g1) == list(range(1000, 1005))
    assert len([r for r in rows if r[2] != 1]) == 20  # untouched
    # time travel to the pre-overwrite version is exact
    old = sorted(
        tuple(r)
        for r in snapshot(spark, d, version=v_before).collect()
    )
    assert len(old) == 30 and max(r[0] for r in old) == 29

    # full overwrite through the verb twin
    new = _seed(spark, 100, 110)
    overwrite_table(spark, d, new)
    assert _rows(spark, d) == sorted(
        tuple(r) for r in new.collect()
    )
    hist = tx_sql(spark, "DESCRIBE HISTORY tbl", t)
    assert [h["op"] for h in hist].count("overwrite") == 2

    # replaceWhere contract: strays outside the named leaf refuse
    with pytest.raises(ValueError, match="outside the overwritten"):
        tx_sql(
            spark,
            "INSERT OVERWRITE tbl PARTITION (grp = 2) "
            "SELECT id AS k, id AS v, CAST(id % 3 AS INT) AS grp "
            "FROM range(5)",
            t,
        )
    # no schema evolution through overwrite
    with pytest.raises(ValueError, match="does not evolve"):
        tx_sql(
            spark,
            "INSERT OVERWRITE tbl SELECT id AS k, id AS v, "
            "CAST(0 AS INT) AS grp, id AS extra FROM range(5)",
            t,
        )
    # VALUES positional binding works through OVERWRITE too
    tx_sql(
        spark,
        "INSERT OVERWRITE TABLE tbl VALUES (7, 70, CAST(1 AS INT))",
        t,
    )
    assert _rows(spark, d) == [(7, 70, 1)]


def test_clone_show_and_script_runner(spark, tmp_path):
    """CREATE TABLE ... SHALLOW CLONE, SHOW TBLPROPERTIES, and the
    quote-aware multi-statement script runner (each statement its own
    commit — a convenience, not a transaction)."""
    from etl_sentinel_imagery_spark.operators.txlog_sql import (
        tx_sql_script,
    )

    d = str(tmp_path / "src")
    d2 = str(tmp_path / "branch")
    t = {"tbl": d, "branch": d2}
    _seed(spark, 0, 20).createOrReplaceTempView("clone_pool")
    results = tx_sql_script(
        spark,
        """
        CREATE TABLE tbl AS SELECT * FROM clone_pool;
        ALTER TABLE tbl SET TBLPROPERTIES ('team' = 'a;b');
        DELETE FROM tbl WHERE k >= 15;
        CREATE TABLE branch SHALLOW CLONE tbl
        """,
        t,
    )
    assert len(results) == 4
    # the quoted ';' did not split, and the property landed intact
    props = tx_sql(spark, "SHOW TBLPROPERTIES tbl", t)
    assert props["team"] == "a;b"
    # the branch is the post-DELETE state, independent thereafter
    assert _rows(spark, d2) == _rows(spark, d)
    tx_sql(spark, "DELETE FROM branch WHERE k < 5", t)
    assert len(_rows(spark, d2)) == 10 and len(_rows(spark, d)) == 15


def test_overwrite_partition_validates_staged_write(spark, tmp_path):
    """Round-8 ADVICE (low): the replaceWhere contract is enforced on
    the STAGED WRITE itself, not on a separate pre-count evaluation of
    the source — (a) a clean deterministic source is evaluated exactly
    once (the old path paid a second full pass for the count), (b) a
    nondeterministic source can never slip strays past a lucky
    pre-count: whatever rows actually staged are what is checked, and
    a refusal leaves zero staged orphans and the table bit-identical."""
    from etl_sentinel_imagery_spark.operators.txlog import (
        overwrite_table,
    )

    d = str(tmp_path / "ovwstg")
    init_table(
        spark,
        d,
        _seed(spark, 0, 30).repartition(3),
        partition_cols=["grp"],
    )

    # (a) exactly-one-evaluation: a per-row side-effect UDF counts how
    # many times the source rows materialize during a clean overwrite
    calls = str(tmp_path / "calls.log")
    tally = F.udf(
        lambda k: (
            open(calls, "a").write(f"{k}\n") and None
        ) or int(k),
        "long",
    )
    src = spark.range(2000, 2010).select(
        tally(F.col("id")).alias("k"),
        F.col("id").alias("v"),
        F.lit(1).cast("int").alias("grp"),
    ).coalesce(1)
    overwrite_table(spark, d, src, partition={"grp": 1})
    n_evals = sum(1 for _ in open(calls))
    assert n_evals == 10, f"source evaluated {n_evals} row-times, not 10"
    rows = _rows(spark, d)
    assert sorted(r[0] for r in rows if r[2] == 1) == list(
        range(2000, 2010)
    )

    # (b) strays refuse FROM the staged files, nothing is left behind
    def _disk(path):
        out = []
        for root, dirs, fnames in os.walk(path):
            dirs[:] = [x for x in dirs if not x.startswith("_")]
            out.extend(
                os.path.relpath(os.path.join(root, f), path)
                for f in fnames
                if f.endswith(".parquet") and not f.startswith("_")
            )
        return sorted(out)

    files_before = _disk(d)
    rows_before = _rows(spark, d)
    v_before = current_version(d)
    with pytest.raises(ValueError, match="outside the overwritten"):
        overwrite_table(
            spark, d, _seed(spark, 3000, 3006), partition={"grp": 2}
        )
    assert current_version(d) == v_before
    assert _rows(spark, d) == rows_before
    # no staged orphan parquet anywhere in the table dir
    assert _disk(d) == files_before


def test_merge_composite_on_keys_matches_python_twin(spark, tmp_path):
    """Round-8 verdict #1 (parser leg): ON t.k1 = s.k1 AND t.k2 = s.k2
    parses into the engine's key-list contract and equals the Python
    twin; rows sharing only one key column do not match."""
    a, b = str(tmp_path / "ck_sql"), str(tmp_path / "ck_py")
    seed = spark.createDataFrame(
        [(i // 4, i % 4, i * 10) for i in range(16)],
        ["k1", "k2", "v"],
    )
    for d in (a, b):
        init_table(spark, d, seed.coalesce(2))
    src = spark.createDataFrame(
        [(i // 4, i % 4, i * 100) for i in range(8, 24)],
        ["k1", "k2", "v"],
    )
    src.createOrReplaceTempView("ck_src")
    tx_sql(
        spark,
        "MERGE INTO tbl t2 USING ck_src s2 "
        "ON t2.k1 = s2.k1 AND t2.k2 = s2.k2 "
        "WHEN MATCHED AND s2.v >= 1200 THEN DELETE "
        "WHEN MATCHED THEN UPDATE SET v = s2.v "
        "WHEN NOT MATCHED AND s2.v < 2000 THEN INSERT *",
        {"tbl": a},
    )
    merge(
        spark,
        b,
        src,
        ["k1", "k2"],
        when_matched=[
            ("delete", "s.v >= 1200"),
            ("update", None, {"v": "s.v"}),
        ],
        when_not_matched=[("insert", "s.v < 2000")],
    )
    assert _rows(spark, a) == _rows(spark, b)
    # tuple semantics: (0, 0) existed only in the target and survives
    assert (0, 0, 0) in _rows(spark, a)


def test_truncate_is_metadata_only(spark, tmp_path, monkeypatch):
    """Round-8 verdict #2: TRUNCATE must be an O(manifest) commit —
    the old route through delete_where(.., "true") scanned every live
    row to write DV positions (a 100 TB truncate read 100 TB). The
    verb takes no SparkSession at all; the spies prove no data file
    is opened and no Spark job runs during the statement. Post-state
    empty, time travel exact, the change feed emits every truncated
    row as a delete, files stay on disk for the retention window."""
    import pyarrow.parquet as pq_mod
    from pyspark.sql import DataFrame

    from etl_sentinel_imagery_spark.operators import txlog as tx

    d = str(tmp_path / "trunc")
    init_table(spark, d, _seed(spark, 0, 30).repartition(3))
    # a DV delete first, so the truncated manifest carries DV-bearing
    # entries (the removes must resolve through them unchanged)
    tx.delete_rows_dv(spark, d, "k", [1, 2])
    v_before = current_version(d)
    t = {"tbl": d}

    footers, jobs = [], []
    orig_pf = pq_mod.ParquetFile
    monkeypatch.setattr(
        pq_mod, "ParquetFile",
        lambda *a, **k: footers.append(a) or orig_pf(*a, **k),
    )
    for meth in ("collect", "count", "toPandas"):
        orig = getattr(DataFrame, meth)

        def spy(self, _orig=orig, _m=meth):
            jobs.append(_m)
            return _orig(self)

        monkeypatch.setattr(DataFrame, meth, spy)
    v = tx_sql(spark, "TRUNCATE TABLE tbl", t)
    monkeypatch.undo()

    assert footers == [], "truncate opened a parquet footer"
    assert jobs == [], f"truncate ran Spark jobs: {jobs}"
    assert v == v_before + 1
    assert snapshot(spark, d).count() == 0
    # time travel to the pre-truncate version is exact (28 live rows)
    assert snapshot(spark, d, version=v_before).count() == 28
    # the feed emits the truncated rows as deletes (IT pays the bytes)
    from etl_sentinel_imagery_spark.operators.txlog import (
        table_changes,
    )

    feed = table_changes(spark, d, v_before, v)
    assert feed.count() == 28
    assert (
        feed.select("_change_type").distinct().collect()[0][0]
        == "delete"
    )
    assert feed.select("_commit_op").distinct().collect()[0][0] == (
        "truncate"
    )
    # truncating an empty table is a no-op commit-wise
    assert tx_sql(spark, "TRUNCATE TABLE tbl", t) == v
    # DELETE FROM without WHERE takes the same metadata-only route
    tx_sql(spark, f"RESTORE TABLE tbl TO VERSION AS OF {v_before}", t)
    jobs2, footers2 = [], []
    import pyarrow.parquet as pq_mod2
    from pyspark.sql import DataFrame as DF2

    orig_pf2 = pq_mod2.ParquetFile
    monkeypatch.setattr(
        pq_mod2, "ParquetFile",
        lambda *a, **k: footers2.append(a) or orig_pf2(*a, **k),
    )
    orig_count = DF2.count
    monkeypatch.setattr(
        DF2, "count",
        lambda self: jobs2.append("count") or orig_count(self),
    )
    tx_sql(spark, "DELETE FROM tbl", t)
    monkeypatch.undo()
    assert footers2 == [] and jobs2 == []
    assert snapshot(spark, d).count() == 0
    # data files are still on disk for the retention window
    n_parquet = sum(
        1
        for root, dirs, fs in os.walk(d)
        if not os.path.basename(root).startswith("_")
        for f in fs
        if f.endswith(".parquet")
    )
    assert n_parquet >= 3


def test_alter_column_not_null(spark, tmp_path):
    """ALTER COLUMN c SET/DROP NOT NULL — Delta's column invariant via
    the CHECK machinery: existing NULLs refuse the SET; writes under
    the invariant refuse NULL batches; DROP re-admits them."""
    import pytest as _pytest

    from etl_sentinel_imagery_spark.operators.txlog import (
        append as _append,
        init_table as _init,
        snapshot as _snap,
    )

    t = str(tmp_path / "nn")
    _init(
        spark,
        t,
        spark.createDataFrame(
            [(1, "a"), (2, "b")], "k long, body string"
        ),
    )
    tx_sql(spark, f"ALTER TABLE `{t}` ALTER COLUMN body SET NOT NULL")
    with _pytest.raises(Exception, match="notnull_body"):
        _append(
            spark,
            t,
            spark.createDataFrame([(3, None)], "k long, body string"),
        )
    with _pytest.raises(TxSqlError, match="unknown column"):
        tx_sql(spark, f"ALTER TABLE `{t}` ALTER COLUMN nope SET NOT NULL")
    tx_sql(spark, f"ALTER TABLE `{t}` ALTER COLUMN body DROP NOT NULL")
    _append(
        spark,
        t,
        spark.createDataFrame([(3, None)], "k long, body string"),
    )
    assert _snap(spark, t).count() == 3
    # SET refuses when existing rows violate
    with _pytest.raises(Exception):
        tx_sql(
            spark, f"ALTER TABLE `{t}` ALTER COLUMN body SET NOT NULL"
        )


def test_describe_table_columns(spark, tmp_path):
    """Plain DESCRIBE t: one row per column with partition flag,
    NOT NULL invariant, DEFAULT, and generation — metadata only."""
    from etl_sentinel_imagery_spark.operators.txlog import init_table

    t = str(tmp_path / "desc")
    init_table(
        spark,
        t,
        spark.createDataFrame(
            [(1, "a", 5)], "k long, body string, grp int"
        ),
        partition_cols=["grp"],
    )
    tx_sql(spark, f"ALTER TABLE `{t}` ALTER COLUMN body SET NOT NULL")
    tx_sql(spark, f"ALTER TABLE `{t}` ALTER COLUMN body SET DEFAULT 'x'")
    rows = {r["col_name"]: r for r in tx_sql(spark, f"DESCRIBE `{t}`")}
    assert set(rows) == {"k", "body", "grp"}
    assert rows["grp"]["partition"] is True
    assert rows["k"]["partition"] is False
    assert rows["body"]["not_null"] is True
    assert rows["body"]["default"] == "'x'" or rows["body"]["default"] == "x"
    assert rows["k"]["default"] is None
    assert rows["k"]["data_type"] == "long"
    # DESCRIBE TABLE form routes identically
    assert tx_sql(spark, f"DESCRIBE TABLE `{t}`") == tx_sql(
        spark, f"DESCRIBE `{t}`"
    )


def test_restore_to_timestamp(spark, tmp_path):
    """RESTORE ... TO TIMESTAMP AS OF: epoch-seconds form resolves via
    the commit-time index (version_at_timestamp's monotonicity
    adjustment included); a pre-history timestamp refuses."""
    import time as _time

    from etl_sentinel_imagery_spark.operators.txlog import (
        append as _append,
        init_table as _init,
        read_manifest as _rm,
        snapshot as _snap,
    )

    t = str(tmp_path / "rts")
    _init(
        spark,
        t,
        spark.createDataFrame([(1, "a")], "k long, v string"),
    )
    _append(
        spark,
        t,
        spark.createDataFrame([(2, "b")], "k long, v string"),
    )
    ts_v1 = _rm(t, 1)["ts"]
    _append(
        spark,
        t,
        spark.createDataFrame([(3, "c")], "k long, v string"),
    )
    tx_sql(
        spark, f"RESTORE TABLE `{t}` TO TIMESTAMP AS OF {ts_v1 + 0.001}"
    )
    assert _snap(spark, t).count() == 2  # the v1 state
    with pytest.raises(Exception, match="pre-history|predates"):
        tx_sql(spark, f"RESTORE TABLE `{t}` TO TIMESTAMP AS OF 1.5")
