"""File-level Bloom data-skipping index — point lookups without
partition keys.

Parquet footers skip row groups by min/max, and partitioning prunes on
the partition column — but a point lookup on a HIGH-CARDINALITY
non-partition key (doc by id, user by email hash) still scans every
file. The standard lake-format answer (Delta/Iceberg bloom filter
indexes, Parquet's own optional bloom pages) is a per-file Bloom
filter consulted BEFORE any data file opens. This module builds that
sidecar from the engine's mergeable bloom kernel (operators.bloom —
same portable polyhash, so the index is engine-checkable):

- `build_file_bloom_index`: one scan; per (file, word) `bit_or` is
  map-side combinable, so the shuffle carries ≤ n_files × n_words
  rows however big the table. The index lands beside the data under
  `_bloom_idx_<col>/` (underscore prefix = invisible to table scans,
  the Hadoop hidden-file convention) via the versioned-pointer commit
  every other sidecar in this engine uses — a crash leaves the pointer
  naming a complete version.
- `bloom_pruned_lookup`: reads the control-plane-sized index
  (n_files rows), tests the probe values against each file's filter
  (no false negatives ⇒ skipped files provably lack the keys), then
  scans ONLY surviving files. Expected files read per probe ≈
  matching files + FP_rate × n_files; the exact filter on the pruned
  scan keeps semantics exact either way.

The index is advisory state derived from data: stale after appends
(new files simply aren't pruned-ABLE — `bloom_pruned_lookup` unions
unindexed files into the scan rather than silently missing them) and
rebuilt idempotently.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_sentinel_imagery_spark.operators.bloom import (
    bloom_contains,
    bloom_words_per_group,
)


def _idx_dir(table_dir: str, key_col: str) -> str:
    return os.path.join(table_dir, f"_bloom_idx_{key_col}")


def build_file_bloom_index(
    spark: SparkSession,
    table_dir: str,
    key_col: str,
    n_bits: int = 1 << 15,
    n_hashes: int = 4,
) -> None:
    """Build/replace the per-file Bloom sidecar for ``key_col``.

    ``n_bits`` sizes each FILE's filter (power of two) — at the default
    32 Kbit / 4 hashes a 10k-key file sits at ~1.2% FP. Keys hash
    through their string form (the same form lookups probe with);
    partition columns need no index — the planner prunes them natively.
    """
    keyed = spark.read.parquet(table_dir).select(
        F.input_file_name().alias("file"),
        F.col(key_col).cast("string").alias("_k"),
    ).where(F.col("_k").isNotNull())
    # the word layout lives in ONE place (operators.bloom) so the index
    # can never drift from bloom_contains
    index = bloom_words_per_group(
        keyed, ["file"], F.col("_k"), n_bits, n_hashes
    )
    sdir = _idx_dir(table_dir, key_col)
    os.makedirs(sdir, exist_ok=True)
    vname = f"v_{uuid.uuid4().hex[:8]}"
    # multi-file write: the index is n_files rows of ~n_bits/8 bytes each
    # (~4 GB at 1M files / 32 Kbit) — funnelling that through one task
    # (the old coalesce(1)) serializes the build at exactly the scale the
    # index targets. The groupBy's natural output partitioning flows
    # through; AQE coalesces the small-index case to few files anyway.
    index.write.mode("overwrite").parquet(os.path.join(sdir, vname))
    ptr_tmp = os.path.join(sdir, f"_CURRENT.tmp{vname}")
    with open(ptr_tmp, "w") as f:
        f.write(vname)
    os.replace(ptr_tmp, os.path.join(sdir, "_CURRENT"))
    for entry in os.listdir(sdir):
        if entry.startswith("v_") and entry != vname:
            shutil.rmtree(os.path.join(sdir, entry), ignore_errors=True)


def read_file_bloom_index(
    spark: SparkSession, table_dir: str, key_col: str
) -> DataFrame:
    sdir = _idx_dir(table_dir, key_col)
    with open(os.path.join(sdir, "_CURRENT")) as f:
        return spark.read.parquet(os.path.join(sdir, f.read().strip()))


def bloom_pruned_lookup(
    spark: SparkSession,
    table_dir: str,
    key_col: str,
    values: list,
) -> tuple[DataFrame, dict]:
    """Exact point lookup ``key_col IN values`` scanning only files whose
    Bloom filter admits at least one probe value (plus any files newer
    than the index — appended data is never silently missed).

    Returns (rows DataFrame, stats dict with files_total / files_read /
    files_unindexed).

    The probe evaluates DISTRIBUTED on the index DataFrame — only FILE
    PATHS ever reach the driver (the true control-plane output). The
    bitsets themselves (~n_bits/8 bytes × n_files ≈ 4 GB at 1M files)
    stay executor-side; n_bits/n_hashes come from one ``first()`` row
    (every row carries the same literals by construction)."""
    idx = read_file_bloom_index(spark, table_dir, key_col)
    shape = idx.select("n_bits", "n_hashes").first()
    if shape is None:
        raise ValueError("empty bloom index")
    n_bits = int(shape["n_bits"])
    n_hashes = int(shape["n_hashes"])
    probe = F.lit(False)
    for v in values:
        probe = probe | F.coalesce(
            bloom_contains(
                F.col("words"), F.lit(str(v)), n_bits, n_hashes
            ),
            F.lit(False),
        )
    candidates = [r["file"] for r in idx.where(probe).select("file").collect()]
    indexed = {r["file"] for r in idx.select("file").collect()}
    # inputFiles() is a FileIndex listing — metadata only, no data scan
    # (an input_file_name() distinct would read the whole table and
    # defeat the index)
    all_files = set(spark.read.parquet(table_dir).inputFiles())
    # a stale index (compaction/targeted delete retired files since the
    # build) may admit files that no longer exist — reading them would
    # fail the whole lookup; dropping them is safe because their LIVE
    # replacement files are unindexed and unioned in below
    candidates = [c for c in candidates if c in all_files]
    unindexed = sorted(all_files - indexed)
    stats = {
        "files_total": len(all_files),
        "files_read": len(candidates) + len(unindexed),
        "files_unindexed": len(unindexed),
    }
    to_read = candidates + unindexed
    if not to_read:
        schema = spark.read.parquet(table_dir).schema
        return spark.createDataFrame([], schema), stats
    # basePath keeps hive-partition columns (and their schema position)
    # identical to a whole-table read even though only leaf files are
    # listed; the filter stays on the RAW column so it pushes down to
    # the parquet reader (a cast would block PushedFilters and row-group
    # min/max skipping inside the surviving files)
    rows = (
        spark.read.option("basePath", table_dir)
        .parquet(*to_read)
        .where(F.col(key_col).isin(values))
    )
    return rows, stats
