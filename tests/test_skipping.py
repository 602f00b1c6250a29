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


def test_lookup_never_collects_bitsets(spark, tmp_path, monkeypatch):
    """100 TB rule: only FILE PATHS reach the driver — the probe must
    evaluate distributed, never by materializing the per-file Bloom
    words arrays (4 KB/file x 1M files is a driver OOM)."""
    path = str(tmp_path / "t5")
    _write_table(spark, path, n=2000, files=6)
    build_file_bloom_index(spark, path, "doc_id")

    # patch the CONCRETE DataFrame class (pyspark 4 routes collect
    # through pyspark.sql.classic, not the abstract base)
    cls = type(spark.range(1))
    collected_schemas = []
    orig_collect = cls.collect

    def spy_collect(self):
        collected_schemas.append([f.name for f in self.schema.fields])
        return orig_collect(self)

    monkeypatch.setattr(cls, "collect", spy_collect)
    rows, stats = bloom_pruned_lookup(spark, path, "doc_id", [42, 1999])
    monkeypatch.undo()
    assert {r["doc_id"] for r in rows.collect()} == {42, 1999}
    assert collected_schemas, "lookup must collect candidate file paths"
    # every driver materialization is control-plane-sized: the shape row
    # (n_bits/n_hashes via first→limit(1).collect) and file-path lists —
    # never a schema carrying the words bitsets
    for cols in collected_schemas:
        assert "words" not in cols, (
            f"driver materialized Bloom bitsets: {cols}"
        )
        assert cols in (["file"], ["n_bits", "n_hashes"]), cols


def test_index_write_is_not_single_task(spark, tmp_path):
    """The sidecar write must not funnel through one task (the old
    coalesce(1)): with AQE's small-partition coalescing disabled, a
    multi-partition index lands as multiple part files."""
    import glob
    import os

    path = str(tmp_path / "t6")
    _write_table(spark, path, n=4000, files=8)
    old = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        build_file_bloom_index(spark, path, "doc_id")
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", old)
    sdir = os.path.join(path, "_bloom_idx_doc_id")
    with open(os.path.join(sdir, "_CURRENT")) as f:
        vdir = os.path.join(sdir, f.read().strip())
    parts = glob.glob(os.path.join(vdir, "part-*.parquet"))
    assert len(parts) > 1, parts
    # and the multi-file index still answers lookups exactly
    rows, _ = bloom_pruned_lookup(spark, path, "doc_id", [123])
    assert [r["doc_id"] for r in rows.collect()] == [123]
