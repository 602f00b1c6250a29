"""Compaction: small files merge, right-sized files untouched, data
byte-identical before/after."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_sentinel_imagery_spark.operators.maintenance import (
    compact_parquet_dir,
    list_data_files,
    plan_compaction,
)
from etl_sentinel_imagery_spark.sources.tables import load_table
from tests.conftest import SF_DIR


def test_compaction_merges_small_preserves_data(spark, tmp_path):
    p = str(tmp_path / "table")
    orders = load_table(spark, SF_DIR, "orders")
    # fragment: 12 tiny files
    orders.repartition(12).write.parquet(p)
    before_files = list_data_files(spark, p)
    assert len(before_files) == 12
    before_rows = {
        r["o_orderkey"] for r in spark.read.parquet(p).collect()
    }

    report = compact_parquet_dir(spark, p, target_bytes=64 * 1024 * 1024)
    assert report["compacted"] == 12
    after_files = list_data_files(spark, p)
    assert len(after_files) == report["files_after"] < 12

    after = spark.read.parquet(p)
    assert {r["o_orderkey"] for r in after.collect()} == before_rows
    assert after.count() == len(before_rows)


def test_compaction_leaves_big_files_alone(spark, tmp_path):
    p = str(tmp_path / "table2")
    orders = load_table(spark, SF_DIR, "orders")
    orders.coalesce(1).write.parquet(p)
    (big_path, big_sz) = list_data_files(spark, p)[0]
    # add tiny siblings
    orders.limit(50).repartition(3).write.mode("append").parquet(p)
    assert len(list_data_files(spark, p)) == 4

    report = compact_parquet_dir(spark, p, target_bytes=2 * big_sz)
    # the big file must survive with its original name
    names = {f for f, _ in list_data_files(spark, p)}
    assert big_path in names
    assert report["compacted"] == 3
    total = load_table(spark, SF_DIR, "orders").count() + 50
    assert spark.read.parquet(p).count() == total


def test_compaction_noop_on_single_small_file(spark, tmp_path):
    p = str(tmp_path / "table3")
    load_table(spark, SF_DIR, "orders").coalesce(1).write.parquet(p)
    report = compact_parquet_dir(spark, p, target_bytes=10**12)
    assert report["compacted"] == 0
    assert report["files_before"] == report["files_after"] == 1


def test_plan_compaction_threshold():
    files = [("a", 10), ("b", 100), ("c", 49), ("d", 50)]
    assert plan_compaction(files, target_bytes=100, small_ratio=0.5) == ["a", "c"]


def test_partitioned_table_compaction_walk(spark, tmp_path):
    from etl_sentinel_imagery_spark.operators.maintenance import (
        compact_partitioned_table,
        list_partition_dirs,
    )

    p = str(tmp_path / "ptable")
    orders = load_table(spark, SF_DIR, "orders").withColumn(
        "bucket", (F.col("o_orderkey") % 3).cast("int")
    )
    orders.repartition(6).write.partitionBy("bucket").parquet(p)
    leaves = list_partition_dirs(spark, p)
    assert len(leaves) == 3 and all("bucket=" in l for l in leaves)
    before = spark.read.parquet(p)
    before_n = before.count()

    report = compact_partitioned_table(spark, p, target_bytes=64 * 1024 * 1024)
    assert report["partitions"] == 3
    assert report["compacted"] > 0
    after = spark.read.parquet(p)
    assert after.count() == before_n
    # fewer files overall, per-partition detail consistent
    assert report["files_after"] < report["files_before"]
    assert sum(d["compacted"] for d in report["detail"].values()) == report["compacted"]


def test_delete_by_key_rewrites_only_admitting_files(spark, tmp_path):
    """Bloom-accelerated targeted delete: keys vanish, untouched files
    keep their exact paths (provably no rewrite), lookups stay exact on
    the stale index, and a NULL-key row survives."""
    from pyspark.sql import functions as F

    from etl_sentinel_imagery_spark.operators.maintenance import delete_by_key
    from etl_sentinel_imagery_spark.operators.skipping import (
        bloom_pruned_lookup,
        build_file_bloom_index,
    )

    path = str(tmp_path / "gdpr")
    spark.range(4000).select(
        F.when(F.col("id") == 3999, None).otherwise(F.col("id")).alias("doc_id"),
        F.concat(F.lit("body-"), F.col("id")).alias("body"),
        (F.col("id") % 2).alias("side"),
    ).repartition(8, "id").write.mode("overwrite").partitionBy("side").parquet(path)
    build_file_bloom_index(spark, path, "doc_id")
    before_files = set(spark.read.parquet(path).inputFiles())

    targets = [17, 2344]
    stats = delete_by_key(spark, path, "doc_id", targets)
    assert stats["rows_deleted"] == 2
    assert 1 <= stats["files_candidates"] < stats["files_total"]
    assert 1 <= stats["files_rewritten"] <= stats["files_candidates"]

    after = spark.read.parquet(path)
    after_files = set(after.inputFiles())
    # non-candidate files are bit-untouched (same paths survive)
    untouched = before_files & after_files
    assert len(untouched) >= stats["files_total"] - stats["files_rewritten"] - 1
    # the data contract: targets gone, everything else (incl. NULL) intact
    assert after.filter(F.col("doc_id").isin(targets)).count() == 0
    assert after.count() == 4000 - 2
    assert after.filter(F.col("doc_id").isNull()).count() == 1
    # partition layout preserved
    assert set(r["side"] for r in after.select("side").distinct().collect()) == {0, 1}

    # the STALE index still serves exact lookups (retired files skipped,
    # replacement files unindexed-but-scanned)
    rows, s2 = bloom_pruned_lookup(spark, path, "doc_id", [17, 100])
    assert [r["doc_id"] for r in rows.collect()] == [100]
    assert s2["files_unindexed"] >= 1


def test_delete_by_key_without_index_and_full_file_retire(spark, tmp_path):
    """use_bloom_index=False scans every file; a file whose every row
    matches is retired without replacement."""
    from pyspark.sql import functions as F

    from etl_sentinel_imagery_spark.operators.maintenance import delete_by_key

    path = str(tmp_path / "plain")
    # file A: ids 0..9, file B: ids 100..109 — delete all of file A
    spark.range(10).select(F.col("id").alias("doc_id")).coalesce(1).write.parquet(path)
    spark.range(100, 110).select(F.col("id").alias("doc_id")).coalesce(1).write.mode(
        "append"
    ).parquet(path)
    stats = delete_by_key(
        spark, path, "doc_id", list(range(10)), use_bloom_index=False
    )
    assert stats["rows_deleted"] == 10
    assert stats["files_candidates"] == stats["files_total"] == 2
    left = spark.read.parquet(path)
    assert sorted(r["doc_id"] for r in left.collect()) == list(range(100, 110))
