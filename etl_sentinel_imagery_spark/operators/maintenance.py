"""Table maintenance: small-file compaction.

Streaming sinks and fine-grained partitioned writes fragment a table
into thousands of tiny files; at 100 TB the scan then pays per-file
open/footer costs that dwarf the data read. Compaction bin-packs the
SMALL files into target-size rewrites and leaves right-sized files
untouched — rewriting only the fraction of the table that needs it,
not the whole partition.

Driver work is file METADATA only (names + sizes via Hadoop's
FileSystem API — thousands of entries, never data); the rewrite itself
is one Spark job over just the selected files. The swap is
crash-ordered: new files land under a temp name inside the directory,
originals are deleted only after the write commits, so a failure
leaves either the old files or old+new (duplicates a re-run cleans),
never a hole.
"""

from __future__ import annotations

import math
import uuid

from pyspark.sql import SparkSession


def _fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    return hpath.getFileSystem(spark._jsc.hadoopConfiguration()), hpath, jvm


def list_data_files(spark: SparkSession, path: str) -> list[tuple[str, int]]:
    """(path, bytes) for every parquet data file directly under ``path``."""
    fs, hpath, _ = _fs(spark, path)
    out = []
    for st in fs.listStatus(hpath):
        name = st.getPath().getName()
        if st.isFile() and name.endswith(".parquet") and not name.startswith("_"):
            out.append((st.getPath().toString(), int(st.getLen())))
    return out


def plan_compaction(
    files: list[tuple[str, int]],
    target_bytes: int,
    small_ratio: float = 0.5,
) -> list[str]:
    """Files worth rewriting: smaller than ``small_ratio``·target. Files
    already near target size are left alone — rewriting them buys
    nothing and costs a full read+write."""
    return [p for p, sz in files if sz < target_bytes * small_ratio]


def compact_parquet_dir(
    spark: SparkSession,
    path: str,
    target_bytes: int = 128 * 1024 * 1024,
    small_ratio: float = 0.5,
) -> dict:
    """Bin-pack the small files of a parquet directory into ~target-size
    files, in place. Returns a report: files before/after, bytes
    rewritten, small files compacted. No-op (and no job) when fewer than
    two small files exist."""
    files = list_data_files(spark, path)
    small = plan_compaction(files, target_bytes, small_ratio)
    if len(small) < 2:
        return {
            "files_before": len(files),
            "files_after": len(files),
            "compacted": 0,
            "bytes_rewritten": 0,
        }
    small_set = set(small)
    bytes_rewritten = sum(sz for p, sz in files if p in small_set)
    n_out = max(1, math.ceil(bytes_rewritten / target_bytes))

    df = spark.read.parquet(*small)
    tmp = f"{path}/_compact_{uuid.uuid4().hex}"
    df.coalesce(n_out).write.parquet(tmp)

    fs, _, jvm = _fs(spark, path)
    # move the committed rewrites up into the table directory…
    moved = []
    for st in fs.listStatus(jvm.org.apache.hadoop.fs.Path(tmp)):
        name = st.getPath().getName()
        if st.isFile() and name.endswith(".parquet"):
            dest = jvm.org.apache.hadoop.fs.Path(
                f"{path}/compacted-{uuid.uuid4().hex}.parquet"
            )
            fs.rename(st.getPath(), dest)
            moved.append(dest.toString())
    fs.delete(jvm.org.apache.hadoop.fs.Path(tmp), True)
    # …then retire the originals (old data stays readable up to here)
    for p in small:
        fs.delete(jvm.org.apache.hadoop.fs.Path(p), False)
    return {
        "files_before": len(files),
        "files_after": len(files) - len(small) + len(moved),
        "compacted": len(small),
        "bytes_rewritten": bytes_rewritten,
    }


def list_partition_dirs(spark: SparkSession, root: str) -> list[str]:
    """Leaf partition directories (key=value path segments, any depth)
    under a partitioned table root — metadata-only recursion."""
    fs, hroot, jvm = _fs(spark, root)
    leaves: list[str] = []

    def walk(hpath) -> None:
        subdirs = [
            st.getPath()
            for st in fs.listStatus(hpath)
            if st.isDirectory() and "=" in st.getPath().getName()
        ]
        if not subdirs:
            leaves.append(hpath.toString())
            return
        for sub in subdirs:
            walk(sub)

    walk(hroot)
    return leaves


def compact_partitioned_table(
    spark: SparkSession,
    root: str,
    target_bytes: int = 128 * 1024 * 1024,
    small_ratio: float = 0.5,
) -> dict:
    """Per-partition compaction walk: each leaf partition directory is
    compacted independently with the same crash-ordered swap, so the
    table stays readable throughout and a failure affects at most one
    partition's in-flight rewrite. Returns the aggregate report plus
    per-partition detail."""
    detail = {}
    totals = {"files_before": 0, "files_after": 0, "compacted": 0, "bytes_rewritten": 0}
    for leaf in list_partition_dirs(spark, root):
        rep = compact_parquet_dir(spark, leaf, target_bytes, small_ratio)
        detail[leaf] = rep
        for k in totals:
            totals[k] += rep[k]
    totals["partitions"] = len(detail)
    totals["detail"] = detail
    return totals


def delete_by_key(
    spark: SparkSession,
    table_dir: str,
    key_col: str,
    values: list,
    use_bloom_index: bool = True,
) -> dict:
    """Targeted row deletion (the GDPR / right-to-be-forgotten shape):
    rewrite ONLY the files that can contain the keys, never the table.

    At 100 TB the naive form — read everything, anti-join, write
    everything — rewrites a petabyte to delete a user. This op finds
    the candidate files first: with ``use_bloom_index`` it probes the
    per-file Bloom sidecar (operators.skipping; no false negatives, so
    a file the filter rejects PROVABLY holds none of the keys) and
    unions any post-index unindexed files; without it, every file is a
    candidate (correct, just unpruned). Candidates are then rewritten
    per DIRECTORY (hive-partition layout preserved — a file's
    replacement lands beside it), with the compaction swap ordering:
    new files commit under the live directory BEFORE originals retire,
    so a crash leaves old, or old+new (transient duplicates a re-run
    cleans — the single-writer maintenance caveat compaction documents),
    never a hole. Files whose every row matches a key are simply
    retired.

    The Bloom sidecar is left stale on purpose: retired files in the
    index are skipped by ``bloom_pruned_lookup`` (it intersects with
    live files) and the replacement files are unindexed ⇒ always
    scanned, so lookups stay EXACT; rebuild the index when the
    unindexed fraction hurts pruning. Returns
    {files_total, files_candidates, files_rewritten, rows_deleted}.
    """
    import os

    from pyspark.sql import functions as F

    from etl_sentinel_imagery_spark.operators.skipping import (
        bloom_contains,
        read_file_bloom_index,
    )

    all_files = set(spark.read.parquet(table_dir).inputFiles())
    if use_bloom_index:
        idx = read_file_bloom_index(spark, table_dir, key_col)
        shape = idx.select("n_bits", "n_hashes").first()
        probe = F.lit(False)
        for v in values:
            probe = probe | F.coalesce(
                bloom_contains(
                    F.col("words"),
                    F.lit(str(v)),
                    int(shape["n_bits"]),
                    int(shape["n_hashes"]),
                ),
                F.lit(False),
            )
        admitted = {
            r["file"] for r in idx.where(probe).select("file").collect()
        }
        indexed = {r["file"] for r in idx.select("file").collect()}
        candidates = sorted(
            (admitted & all_files) | (all_files - indexed)
        )
    else:
        candidates = sorted(all_files)

    fs, _, jvm = _fs(spark, table_dir)
    rows_deleted = 0
    rewritten = 0
    by_dir: dict[str, list[str]] = {}
    for f in candidates:
        by_dir.setdefault(os.path.dirname(f), []).append(f)
    for d, files in sorted(by_dir.items()):
        # plain per-file read (no basePath): partition columns stay
        # encoded in the directory, the data columns round-trip as-is
        df = spark.read.parquet(*files)
        hit = df.filter(F.col(key_col).isin(values))
        n_hit = hit.count()
        if n_hit == 0:
            continue  # bloom false positive — nothing to rewrite here
        rows_deleted += n_hit
        kept = df.filter(
            ~F.coalesce(F.col(key_col).isin(values), F.lit(False))
        )
        tmp = f"{d}/_delete_{uuid.uuid4().hex}"
        kept.write.parquet(tmp)
        for st in fs.listStatus(jvm.org.apache.hadoop.fs.Path(tmp)):
            name = st.getPath().getName()
            if st.isFile() and name.endswith(".parquet"):
                fs.rename(
                    st.getPath(),
                    jvm.org.apache.hadoop.fs.Path(
                        f"{d}/deleted-{uuid.uuid4().hex}.parquet"
                    ),
                )
        fs.delete(jvm.org.apache.hadoop.fs.Path(tmp), True)
        for f in files:
            fs.delete(jvm.org.apache.hadoop.fs.Path(f), False)
        rewritten += len(files)
    return {
        "files_total": len(all_files),
        "files_candidates": len(candidates),
        "files_rewritten": rewritten,
        "rows_deleted": rows_deleted,
    }
