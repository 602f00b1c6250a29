"""File-level Bloom skipping: exact lookups, real pruning, append
safety."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_sentinel_imagery_spark.operators.skipping import (
    bloom_pruned_lookup,
    build_file_bloom_index,
    read_file_bloom_index,
)


def _write_table(spark, path, n=4000, files=8):
    spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("payload-"), F.col("id")).alias("body"),
    ).repartition(files, "doc_id").write.mode("overwrite").parquet(path)


def test_lookup_finds_rows_and_prunes_files(spark, tmp_path):
    path = str(tmp_path / "t")
    _write_table(spark, path)
    build_file_bloom_index(spark, path, "doc_id")
    idx = read_file_bloom_index(spark, path, "doc_id")
    assert idx.count() == 8

    rows, stats = bloom_pruned_lookup(spark, path, "doc_id", [1234])
    got = rows.collect()
    assert [(r["doc_id"], r["body"]) for r in got] == [(1234, "payload-1234")]
    assert stats["files_total"] == 8
    assert stats["files_unindexed"] == 0
    # the key lives in exactly one file; FPs may admit a few more but
    # never the whole table
    assert 1 <= stats["files_read"] < 8

    # multi-probe lookup
    rows2, stats2 = bloom_pruned_lookup(
        spark, path, "doc_id", [10, 20, 3999]
    )
    assert {r["doc_id"] for r in rows2.collect()} == {10, 20, 3999}
    assert stats2["files_read"] <= 8


def test_absent_key_reads_few_or_no_files(spark, tmp_path):
    path = str(tmp_path / "t2")
    _write_table(spark, path)
    build_file_bloom_index(spark, path, "doc_id")
    rows, stats = bloom_pruned_lookup(spark, path, "doc_id", [999_999])
    assert rows.count() == 0
    # no false negatives is the guarantee; FPs are rare at this sizing
    assert stats["files_read"] <= 2


def test_appended_files_are_never_silently_missed(spark, tmp_path):
    path = str(tmp_path / "t3")
    _write_table(spark, path, n=1000, files=4)
    build_file_bloom_index(spark, path, "doc_id")
    # append rows with NEW keys after the index was built
    spark.range(50_000, 50_010).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("late-"), F.col("id")).alias("body"),
    ).coalesce(1).write.mode("append").parquet(path)

    rows, stats = bloom_pruned_lookup(spark, path, "doc_id", [50_005])
    assert [r["body"] for r in rows.collect()] == ["late-50005"]
    assert stats["files_unindexed"] >= 1

    # rebuilding folds the new files into the index
    build_file_bloom_index(spark, path, "doc_id")
    rows2, stats2 = bloom_pruned_lookup(spark, path, "doc_id", [50_005])
    assert [r["body"] for r in rows2.collect()] == ["late-50005"]
    assert stats2["files_unindexed"] == 0
    assert stats2["files_read"] < stats2["files_total"]


def test_null_keys_do_not_break_build(spark, tmp_path):
    path = str(tmp_path / "t4")
    spark.createDataFrame(
        [(1, "a"), (None, "b"), (3, "c")], "doc_id bigint, body string"
    ).coalesce(1).write.mode("overwrite").parquet(path)
    build_file_bloom_index(spark, path, "doc_id")
    rows, _ = bloom_pruned_lookup(spark, path, "doc_id", [3])
    assert [r["body"] for r in rows.collect()] == ["c"]


def test_partitioned_table_keeps_partition_columns(spark, tmp_path):
    """Hive-partitioned tables: pruned-scan schema must equal the
    whole-table schema (basePath keeps the partition column), and the
    filter pushes down on the raw key."""
    path = str(tmp_path / "tp")
    spark.range(2000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("p-"), F.col("id")).alias("body"),
        (F.col("id") % 3).alias("bucket3"),
    ).repartition(4, "doc_id").write.mode("overwrite").partitionBy(
        "bucket3"
    ).parquet(path)
    build_file_bloom_index(spark, path, "doc_id")
    rows, stats = bloom_pruned_lookup(spark, path, "doc_id", [777])
    got = rows.collect()
    assert [
        (r["doc_id"], r["body"], r["bucket3"]) for r in got
    ] == [(777, "p-777", 0)]
    assert set(rows.columns) == set(
        spark.read.parquet(path).columns
    )
    assert stats["files_read"] < stats["files_total"]
    # the exact filter reaches the parquet scan (pushdown not blocked)
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        rows.explain("formatted")
    pushed = [
        ln for ln in buf.getvalue().splitlines() if "PushedFilters" in ln
    ]
    # single-value isin folds to EqualTo; either way the key predicate
    # must reach the scan
    assert pushed and "doc_id" in pushed[0], pushed
