"""The txlog change feed as a FIRST-CLASS Structured Streaming source
(`sources/txlog_stream.py`): Spark-managed version offsets, manifests-
only driver planning, executor-side Arrow reads — and bit-parity with
the batch :func:`operators.txlog.table_changes` contract across every
write verb (append, DV delete, predicate delete, UPDATE, merge),
column mapping, hive partitioning, rewrite-skip, truncate horizons,
and schema evolution."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_sentinel_imagery_spark.operators.txlog import (
    append,
    compact,
    current_version,
    delete_rows_dv,
    delete_where,
    init_table,
    merge_upsert,
    rename_column,
    table_changes,
    truncate_history,
    update_rows,
)
from etl_sentinel_imagery_spark.sources.txlog_stream import (
    plan_change_partitions,
    register,
)


def _seed(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"),
        (F.col("id") * 2).alias("v"),
        (F.col("id") % 3).cast("int").alias("grp"),
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _drain(spark, d, ckpt, **opts):
    """availableNow drain through a checkpointed foreachBatch — the
    resume-capable sink shape (memory sink cannot recover)."""
    rows: list = []
    reader = spark.readStream.format("txlog_changes").option("path", d)
    for k, v in opts.items():
        reader = reader.option(k, v)
    q = (
        reader.load()
        .writeStream.foreachBatch(
            lambda df, _eid: rows.extend(tuple(r) for r in df.collect())
        )
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return sorted(rows)


def test_batch_reader_parity_across_all_write_verbs(spark, tmp_path):
    d = str(tmp_path / "t")
    init_table(spark, d, _seed(spark, 0, 40).coalesce(2))
    append(spark, d, _seed(spark, 40, 60).coalesce(2))
    delete_rows_dv(spark, d, "k", [3, 7, 45])
    delete_where(spark, d, "grp = 2 AND k >= 50")
    update_rows(spark, d, "k < 5", {"v": "v + 1000"})
    merge_upsert(
        spark,
        d,
        spark.range(55, 65).select(
            F.col("id").alias("k"),
            (F.col("id") * 100).alias("v"),
            F.lit(1).cast("int").alias("grp"),
        ),
        "k",
    )
    register(spark)
    got = (
        spark.read.format("txlog_changes").option("path", d).load()
    )
    exp = table_changes(spark, d, -1)
    assert sorted(got.columns) == sorted(exp.columns)
    assert _rows(got.select(*exp.columns)) == _rows(exp)
    # range-scoped read matches too
    got2 = (
        spark.read.format("txlog_changes")
        .option("path", d)
        .option("fromVersion", 2)
        .option("toVersion", 4)
        .load()
    )
    assert _rows(got2.select(*exp.columns)) == _rows(
        table_changes(spark, d, 2, 4)
    )


def test_stream_offsets_resume_and_rewrites_skip(spark, tmp_path):
    d = str(tmp_path / "t")
    ckpt = str(tmp_path / "ckpt")
    init_table(spark, d, _seed(spark, 0, 20).coalesce(2))
    append(spark, d, _seed(spark, 20, 30).coalesce(1))
    register(spark)

    g1 = _drain(spark, d, ckpt)
    assert g1 == _rows(table_changes(spark, d, -1))
    v1 = current_version(d)

    delete_rows_dv(spark, d, "k", [3, 7, 25])
    compact(spark, d)  # rewrite inside the range: contributes nothing
    append(spark, d, _seed(spark, 100, 105).coalesce(1))
    # SAME checkpoint: Spark's offset log resumes past v1, no replay
    g2 = _drain(spark, d, ckpt)
    assert g2 == _rows(table_changes(spark, d, v1))
    assert len(g2) == 3 + 5  # dv deletes + appended inserts only
    # caught up: a third drain delivers nothing
    assert _drain(spark, d, ckpt) == []


def test_partition_granularity_is_per_file_on_scale_paths(
    spark, tmp_path
):
    d = str(tmp_path / "t")
    init_table(spark, d, _seed(spark, 0, 10).coalesce(1))
    for lo in (10, 20, 30):  # three more single-file appends
        append(spark, d, _seed(spark, lo, lo + 10).coalesce(1))
    delete_rows_dv(spark, d, "k", [1, 11, 21, 31])  # touches all 4
    merge_upsert(
        spark,
        d,
        spark.range(38, 44).select(
            F.col("id").alias("k"),
            F.lit(0).alias("v"),
            F.lit(0).cast("int").alias("grp"),
        ),
        "k",
    )
    binds = {"k": "k", "v": "v", "grp": "grp"}
    parts = plan_change_partitions(d, -1, current_version(d), binds)
    kinds = [p["kind"] for p in parts]
    # init+appends: one INSERT partition per file (parallel), DV
    # delete: one DV_DELTA per touched file, merge: ONE delta-sized
    # diff commit
    assert kinds.count("insert") == 4
    assert kinds.count("dv_delta") == 4
    assert kinds.count("diff") == 1


def test_column_mapping_and_hive_partitions(spark, tmp_path):
    d = str(tmp_path / "t")
    init_table(
        spark,
        d,
        _seed(spark, 0, 30).coalesce(1),
        partition_cols=["grp"],
    )
    rename_column(d, "v", "val")
    append(spark, d, _seed(spark, 30, 40).withColumnRenamed("v", "val"))
    delete_rows_dv(spark, d, "k", [2, 35])
    register(spark)
    got = spark.read.format("txlog_changes").option("path", d).load()
    # declared-schema semantics: a rename is a schema-level IDENTITY,
    # so pre-rename rows' values serve under the CURRENT name (the
    # Delta column-mapping read) — where the version-faithful batch
    # table_changes keeps them under each commit's own name. The two
    # agree exactly modulo coalescing the rename pair.
    exp = table_changes(spark, d, -1).withColumn(
        "val", F.coalesce("val", "v")
    )
    assert set(got.columns) == {
        "k", "val", "grp", "_change_type", "_commit_version", "_commit_op"
    }
    assert got.where(F.col("val").isNull()).count() == 0
    assert _rows(got) == _rows(exp.select(*got.columns))


def test_schema_evolution_beyond_stream_raises(spark, tmp_path):
    d = str(tmp_path / "t")
    init_table(spark, d, _seed(spark, 0, 10).coalesce(1))
    append(
        spark,
        d,
        _seed(spark, 10, 20).withColumn("extra", F.lit("x")).coalesce(1),
    )
    # stream declared at head sees the widened schema: evolution
    # BEFORE the range NULL-fills
    register(spark)
    got = spark.read.format("txlog_changes").option("path", d).load()
    exp = table_changes(spark, d, -1)
    assert _rows(got.select(*exp.columns)) == _rows(exp)
    # but a stream PINNED before the evolution (declared schema from
    # version 0) refuses the widening commit (restart to adopt —
    # Delta's behavior)
    with pytest.raises(Exception, match="restart"):
        plan_change_partitions(
            d,
            -1,
            current_version(d),
            {"k": "k", "v": "v", "grp": "grp"},
            pinned_version=0,
        )


def test_stateful_aggregation_over_the_stream(spark, tmp_path):
    """The point of a real source: the feed composes with stateful
    streaming ops downstream — here a running per-group insert count
    in update mode, which the foreachBatch pull loop cannot express."""
    d = str(tmp_path / "t")
    ckpt = str(tmp_path / "ckpt")
    init_table(spark, d, _seed(spark, 0, 30).coalesce(1))
    append(spark, d, _seed(spark, 30, 60).coalesce(1))
    register(spark)
    agg = (
        spark.readStream.format("txlog_changes")
        .option("path", d)
        .load()
        .where(F.col("_change_type") == "insert")
        .groupBy("grp")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("grp_counts")
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {r["grp"]: r["n"] for r in spark.table("grp_counts").collect()}
    assert got == {0: 20, 1: 20, 2: 20}


def test_truncate_horizon_serves_initial_snapshot(spark, tmp_path):
    """A stream starting AT a truncate_history horizon gets the
    horizon's full file list as its initial-snapshot insert set —
    Delta's snapshot-then-tail shape, from the self-contained
    manifest."""
    d = str(tmp_path / "t")
    init_table(spark, d, _seed(spark, 0, 20).coalesce(1))
    append(spark, d, _seed(spark, 20, 30).coalesce(1))
    delete_rows_dv(spark, d, "k", [5])
    horizon = truncate_history(d, keep_versions=0)["horizon"]
    append(spark, d, _seed(spark, 50, 55).coalesce(1))
    register(spark)
    got = (
        spark.read.format("txlog_changes")
        .option("path", d)
        .option("fromVersion", horizon - 1)
        .load()
    )
    ins = got.where(F.col("_change_type") == "insert")
    # 29 live rows at the horizon + 5 appended after it
    assert ins.count() == 29 + 5
    assert got.where(F.col("_change_type") == "delete").count() == 0
    ks = {r["k"] for r in ins.collect()}
    assert 5 not in ks and {50, 51, 52, 53, 54} <= ks


def test_starting_version_latest_sees_only_new_commits(
    spark, tmp_path
):
    d = str(tmp_path / "t")
    ckpt = str(tmp_path / "ckpt")
    init_table(spark, d, _seed(spark, 0, 20).coalesce(1))
    register(spark)
    assert _drain(spark, d, ckpt, startingVersion="latest") == []
    append(spark, d, _seed(spark, 20, 25).coalesce(1))
    g = _drain(spark, d, ckpt, startingVersion="latest")
    assert sorted(r[0] for r in g) == [20, 21, 22, 23, 24]


def test_table_source_snapshot_parity_and_time_travel(
    spark, tmp_path
):
    """`spark.read.format("txlog_table")` answers exactly what
    snapshot() answers — across DV deletes, updates and merges — and
    versionAsOf/timestampAsOf pin any historical version."""
    from etl_sentinel_imagery_spark.operators.txlog import (
        append,
        current_version,
        delete_rows_dv,
        init_table,
        merge_upsert,
        read_manifest,
        snapshot,
        update_rows,
    )

    d = str(tmp_path / "tbl")
    init_table(spark, d, _seed(spark, 0, 40).repartition(3))
    append(spark, d, _seed(spark, 40, 60).coalesce(1))
    delete_rows_dv(spark, d, "k", [3, 41])
    update_rows(spark, d, "k = 7", {"v": F.lit(700)})
    merge_upsert(
        spark,
        d,
        spark.createDataFrame(
            [(100, 1000, 1)], "k long, v long, grp int"
        ),
        "k",
    )
    register(spark)
    got = spark.read.format("txlog_table").option("path", d).load()
    assert _rows(got) == _rows(snapshot(spark, d))
    # names+types match; the source keeps the RECORDED nullability
    # (tighter), where a parquet read relaxes everything to nullable
    assert [(f.name, f.dataType) for f in got.schema] == [
        (f.name, f.dataType) for f in snapshot(spark, d).schema
    ]
    # time travel: every committed version answers bit-identically
    for v in range(current_version(d) + 1):
        tv = (
            spark.read.format("txlog_table")
            .option("path", d)
            .option("versionAsOf", v)
            .load()
        )
        assert _rows(tv) == _rows(snapshot(spark, d, version=v)), v
    # timestampAsOf resolves through commit timestamps
    ts = read_manifest(d, 1)["ts"]
    t1 = (
        spark.read.format("txlog_table")
        .option("path", d)
        .option("timestampAsOf", ts)
        .load()
    )
    assert _rows(t1) == _rows(snapshot(spark, d, version=1))


def test_table_source_sql_view_and_partitions(spark, tmp_path):
    """The table is a first-class SQL relation: CREATE TEMPORARY VIEW
    ... USING txlog_table, with hive partition values and column
    renames served under the read contract, one partition per file."""
    from etl_sentinel_imagery_spark.operators.txlog import (
        init_table,
        rename_column,
        snapshot,
    )

    d = str(tmp_path / "sqltbl")
    init_table(
        spark,
        d,
        _seed(spark, 0, 30).repartition(2),
        partition_cols=["grp"],
    )
    rename_column(d, "v", "value")
    register(spark)
    spark.sql("DROP VIEW IF EXISTS t6")
    spark.sql(
        f"CREATE TEMPORARY VIEW t6 USING txlog_table "
        f"OPTIONS (path '{d}')"
    )
    try:
        got = spark.sql(
            "SELECT grp, sum(value) AS s FROM t6 GROUP BY grp ORDER BY grp"
        ).collect()
        exp = (
            snapshot(spark, d)
            .groupBy("grp")
            .agg(F.sum("value").alias("s"))
            .orderBy("grp")
            .collect()
        )
        assert [tuple(r) for r in got] == [tuple(r) for r in exp]
        # scale shape: one input partition per live data file
        df = spark.read.format("txlog_table").option("path", d).load()
        n_files = len(
            __import__(
                "etl_sentinel_imagery_spark.operators.txlog",
                fromlist=["resolve_files"],
            ).resolve_files(d)
        )
        assert df.rdd.getNumPartitions() == n_files
    finally:
        spark.sql("DROP VIEW IF EXISTS t6")
