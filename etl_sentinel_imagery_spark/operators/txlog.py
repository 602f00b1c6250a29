"""Minimal table-format transaction log — snapshot-isolated appends,
deletes, and compaction over plain parquet.

The engine's maintenance ops (compaction, targeted delete) use a
crash-ordered swap that is safe but exposes a TRANSIENT WINDOW where a
directory-listing reader sees old+new files together (documented in
operators.maintenance). The lake-format answer (Delta/Iceberg) is a
manifest log: the set of live files is a VERSIONED JSON manifest, the
current version is an atomic pointer, and readers resolve the file
list from a manifest — so every reader sees exactly one committed
snapshot, writers commit old+new swaps in ONE pointer flip, and any
historical version stays readable (time travel). This module is that
pattern at its irreducible core:

- ``_txlog/v_<n>.json``: full live-file list + op + parent version
  (full lists, not deltas — manifests are file-count-sized metadata,
  and at 1M files ≈ tens of MB of driver-side JSON, which is the same
  control-plane budget as the Bloom index's path list);
- ``_txlog/_CURRENT``: the committed version, flipped with
  ``os.replace`` (atomic on POSIX);
- optimistic concurrency: a committer CLAIMS version n+1 by
  ``os.link``-ing its fully-written temp manifest to ``v_<n+1>.json``
  — link fails with EEXIST if another writer won, which surfaces as
  :class:`TxConflict` (retry with a fresh snapshot). POSIX-semantics
  note, stated honestly: atomic link/replace hold on real filesystems;
  object stores need a CAS service for exactly this step — the same
  caveat Delta's LogStore abstraction exists for.

Readers MUST resolve through :func:`snapshot` — a raw directory scan
of a txlog table sees uncommitted and removed files (exactly like a
Delta directory without a Delta reader). Crash safety: data files are
written BEFORE their manifest commits (an orphaned data file is
garbage, never corruption); a crash between manifest link and pointer
flip leaves a claimed-but-unreferenced version whose successor commit
simply claims the next number.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class TxConflict(RuntimeError):
    """Another writer committed the version this commit was based on."""


def _entry_name(e) -> str:
    """Manifest file entries are plain names, or {name, stats} dicts
    when the table tracks column stats."""
    return e if isinstance(e, str) else e["name"]


def _log_dir(table_dir: str) -> str:
    return os.path.join(table_dir, "_txlog")


def _manifest_path(table_dir: str, version: int) -> str:
    return os.path.join(_log_dir(table_dir), f"v_{version:08d}.json")


def current_version(table_dir: str) -> int:
    with open(os.path.join(_log_dir(table_dir), "_CURRENT")) as f:
        return int(f.read().strip())


def read_manifest(table_dir: str, version: int | None = None) -> dict:
    if version is None:
        version = current_version(table_dir)
    with open(_manifest_path(table_dir, version)) as f:
        return json.load(f)


def _write_pointer(table_dir: str, version: int) -> None:
    ptr = os.path.join(_log_dir(table_dir), "_CURRENT")
    tmp = ptr + f".tmp{version}"
    with open(tmp, "w") as f:
        f.write(str(version))
    os.replace(tmp, ptr)


def _commit(
    table_dir: str,
    parent: int,
    files: list,
    op: str,
    stat_cols: list | None = None,
) -> int:
    """Claim parent+1 via atomic link of a fully-written temp manifest;
    flip the pointer. Raises TxConflict when the claim loses."""
    version = parent + 1
    ldir = _log_dir(table_dir)
    payload = json.dumps(
        {
            "version": version,
            "parent": parent,
            "op": op,
            "stat_cols": stat_cols or [],
            "files": sorted(files, key=_entry_name),
        },
        indent=0,
    )
    tmp = os.path.join(ldir, f"_tmp_{uuid.uuid4().hex}.json")
    with open(tmp, "w") as f:
        f.write(payload)
        f.flush()
        os.fsync(f.fileno())
    try:
        os.link(tmp, _manifest_path(table_dir, version))
    except FileExistsError as e:
        os.unlink(tmp)
        raise TxConflict(
            f"version {version} already committed by another writer; "
            "re-read the snapshot and retry"
        ) from e
    os.unlink(tmp)
    _write_pointer(table_dir, version)
    return version


def _file_stats(path: str, stat_cols: list[str]) -> dict:
    """Per-column [min, max] from the parquet FOOTER (pyarrow metadata
    — no data scan): the Iceberg-manifest trick that lets the PLANNER
    skip files from metadata alone."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(path).metadata
    idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
    out: dict = {}
    for col in stat_cols:
        ci = idx.get(col)
        if ci is None:
            continue
        lo = hi = None
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(ci).statistics
            if st is None or not st.has_min_max:
                lo = hi = None
                break
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
        if lo is not None:
            # JSON-portable (timestamps etc. stringify; comparisons on
            # read use the same python ordering as here)
            out[col] = [
                lo if isinstance(lo, (int, float, str)) else str(lo),
                hi if isinstance(hi, (int, float, str)) else str(hi),
            ]
    return out


def _move_in_data_files(
    spark: SparkSession,
    table_dir: str,
    df: DataFrame,
    stat_cols: list[str] | None = None,
) -> list:
    """Write df's parquet files under unique names in the table dir;
    return their table-relative names (or (name, stats) entries when
    ``stat_cols`` is set). Data lands BEFORE any commit references
    it."""
    staging = os.path.join(table_dir, f"_stage_{uuid.uuid4().hex}")
    df.write.parquet(staging)
    names: list = []
    for entry in os.listdir(staging):
        if entry.endswith(".parquet") and not entry.startswith("_"):
            name = f"part-{uuid.uuid4().hex}.parquet"
            dest = os.path.join(table_dir, name)
            os.replace(os.path.join(staging, entry), dest)
            if stat_cols:
                names.append(
                    {"name": name, "stats": _file_stats(dest, stat_cols)}
                )
            else:
                names.append(name)
    import shutil

    shutil.rmtree(staging, ignore_errors=True)
    return names


def init_table(
    spark: SparkSession,
    table_dir: str,
    df: DataFrame | None = None,
    stat_cols: list | None = None,
) -> int:
    """Create an empty (or seeded) txlog table: version 0 manifest.
    ``stat_cols`` turns on Iceberg-style per-file min/max stats (read
    from parquet footers at commit time) for every subsequent write —
    :func:`snapshot_pruned` then skips files from METADATA alone."""
    os.makedirs(_log_dir(table_dir), exist_ok=True)
    files = (
        _move_in_data_files(spark, table_dir, df, stat_cols)
        if df is not None
        else []
    )
    payload = json.dumps(
        {
            "version": 0,
            "parent": None,
            "op": "init",
            "stat_cols": stat_cols or [],
            "files": sorted(files, key=_entry_name),
        },
        indent=0,
    )
    path = _manifest_path(table_dir, 0)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        f.write(payload)
    try:
        os.link(tmp, path)
    except FileExistsError as e:
        os.unlink(tmp)
        raise TxConflict("table already initialized") from e
    os.unlink(tmp)
    _write_pointer(table_dir, 0)
    return 0


def snapshot(
    spark: SparkSession, table_dir: str, version: int | None = None
) -> DataFrame:
    """The committed table at ``version`` (default: current) — time
    travel is just naming an older manifest."""
    m = read_manifest(table_dir, version)
    if not m["files"]:
        raise ValueError(
            f"version {m['version']} of {table_dir} is empty; no schema "
            "to serve (seed init_table with a DataFrame)"
        )
    return spark.read.parquet(
        *[os.path.join(table_dir, _entry_name(f)) for f in m["files"]]
    )


def history(table_dir: str) -> list[dict]:
    """Every committed manifest, oldest first (op + file counts)."""
    out = []
    for v in range(current_version(table_dir) + 1):
        p = _manifest_path(table_dir, v)
        if os.path.exists(p):
            with open(p) as f:
                m = json.load(f)
            out.append(
                {"version": m["version"], "op": m["op"], "n_files": len(m["files"])}
            )
    return out


def append(spark: SparkSession, table_dir: str, df: DataFrame) -> int:
    """Transactional append: new files land, then one commit adds them.
    Stats tracking (stat_cols) is inherited from the parent manifest."""
    parent = current_version(table_dir)
    m = read_manifest(table_dir, parent)
    stat_cols = m.get("stat_cols") or None
    names = _move_in_data_files(spark, table_dir, df, stat_cols)
    return _commit(
        table_dir, parent, m["files"] + names, "append", stat_cols
    )


def delete_rows(
    spark: SparkSession, table_dir: str, key_col: str, values: list
) -> int:
    """Transactional targeted delete: candidate files (those actually
    holding matches) rewrite to new files; ONE commit swaps old for new
    — a snapshot reader never sees duplicates or partial deletes."""
    parent = current_version(table_dir)
    m = read_manifest(table_dir, parent)
    stat_cols = m.get("stat_cols") or None
    old_files = m["files"]
    keep_files: list = []
    new_names: list = []
    for entry in old_files:
        name = _entry_name(entry)
        path = os.path.join(table_dir, name)
        df = spark.read.parquet(path)
        n_hit = df.filter(F.col(key_col).isin(values)).count()
        if n_hit == 0:
            keep_files.append(entry)
            continue
        kept = df.filter(
            ~F.coalesce(F.col(key_col).isin(values), F.lit(False))
        )
        if kept.limit(1).count() > 0:
            new_names += _move_in_data_files(
                spark, table_dir, kept, stat_cols
            )
        # fully-matched files simply drop out of the manifest
    return _commit(
        table_dir, parent, keep_files + new_names, "delete", stat_cols
    )


def compact(
    spark: SparkSession, table_dir: str, target_files: int = 1
) -> int:
    """Transactional compaction: rewrite the snapshot into
    ``target_files`` files; one commit swaps the whole list — no
    old+new transient, unlike the directory-swap compactor."""
    parent = current_version(table_dir)
    stat_cols = read_manifest(table_dir, parent).get("stat_cols") or None
    df = snapshot(spark, table_dir, parent)
    names = _move_in_data_files(
        spark, table_dir, df.coalesce(target_files), stat_cols
    )
    return _commit(table_dir, parent, names, "compact", stat_cols)


def vacuum(table_dir: str) -> list[str]:
    """Delete data files referenced by NO manifest (orphans from
    crashed writers). Files referenced by historical manifests are
    kept — time travel stays valid; truncate history first if space
    matters."""
    referenced: set[str] = set()
    for v in range(current_version(table_dir) + 1):
        p = _manifest_path(table_dir, v)
        if os.path.exists(p):
            with open(p) as f:
                referenced.update(
                    _entry_name(e) for e in json.load(f)["files"]
                )
    removed = []
    for entry in os.listdir(table_dir):
        if (
            entry.endswith(".parquet")
            and not entry.startswith("_")
            and entry not in referenced
        ):
            os.unlink(os.path.join(table_dir, entry))
            removed.append(entry)
    return removed


def snapshot_pruned(
    spark: SparkSession,
    table_dir: str,
    col: str,
    lo=None,
    hi=None,
    version: int | None = None,
) -> tuple[DataFrame, dict]:
    """Snapshot reading ONLY files whose manifest [min, max] for
    ``col`` intersects [lo, hi] — file skipping decided from manifest
    METADATA, before any parquet footer opens (the Iceberg planning
    path; the engine's Bloom index answers point lookups, this answers
    RANGES). Files without recorded stats are always read (safety, no
    false pruning). The range predicate is ALSO applied to the rows
    (pruning is an optimization, never a filter). Returns
    (DataFrame, {files_total, files_read, files_skipped})."""
    m = read_manifest(table_dir, version)
    if col not in (m.get("stat_cols") or []):
        raise ValueError(
            f"column {col!r} has no manifest stats; init the table with "
            f"stat_cols=[{col!r}, ...]"
        )
    keep, skipped = [], 0
    for e in m["files"]:
        st = (e.get("stats") or {}).get(col) if isinstance(e, dict) else None
        if st is None:
            keep.append(_entry_name(e))
            continue
        fmin, fmax = st
        if (lo is not None and fmax < lo) or (hi is not None and fmin > hi):
            skipped += 1
            continue
        keep.append(_entry_name(e))
    stats = {
        "files_total": len(m["files"]),
        "files_read": len(keep),
        "files_skipped": skipped,
    }
    if not keep:
        schema = snapshot(spark, table_dir, version).schema
        return spark.createDataFrame([], schema), stats
    df = spark.read.parquet(*[os.path.join(table_dir, f) for f in keep])
    pred = F.lit(True)
    if lo is not None:
        pred = pred & (F.col(col) >= lo)
    if hi is not None:
        pred = pred & (F.col(col) <= hi)
    return df.where(pred), stats


def file_diff(
    table_dir: str, v_from: int, v_to: int
) -> tuple[list[str], list[str]]:
    """(added, removed) file names between two committed versions —
    manifest set difference, no data touched."""
    a = {_entry_name(e) for e in read_manifest(table_dir, v_from)["files"]}
    b = {_entry_name(e) for e in read_manifest(table_dir, v_to)["files"]}
    return sorted(b - a), sorted(a - b)


def incremental_agg_delta(
    spark: SparkSession,
    table_dir: str,
    v_from: int,
    v_to: int,
    group_cols: list[str],
    count_alias: str = "n",
    sum_cols: list[str] | None = None,
) -> DataFrame:
    """SIGNED delta of additive aggregates (count + sums) between two
    table versions, computed by reading ONLY the files that changed —
    the incremental materialized-view refresh: a petabyte table whose
    day appended 0.1% re-aggregates 0.1%, and
    ``old_mv ⊎ delta == full recompute`` exactly (additivity).

    Removed files contribute negatively; a group whose net delta is
    zero still appears (apply with an outer merge and drop zero-count
    rows if the MV should stay minimal). Note: a compaction rewrites
    every file, so a range that crosses one degenerates to a full
    re-read of both sides — refresh BEFORE compacting, or anchor
    ``v_from`` after it."""
    added, removed = file_diff(table_dir, v_from, v_to)
    sum_cols = sum_cols or []

    def agg_of(files: list[str], sign: int) -> DataFrame | None:
        if not files:
            return None
        df = spark.read.parquet(
            *[os.path.join(table_dir, f) for f in files]
        )
        aggs = [
            (F.count(F.lit(1)) * sign).alias(count_alias)
        ] + [
            (F.sum(c) * sign).alias(f"sum_{c}") for c in sum_cols
        ]
        return df.groupBy(*group_cols).agg(*aggs)

    pos = agg_of(added, 1)
    neg = agg_of(removed, -1)
    if pos is None and neg is None:
        schema_df = snapshot(spark, table_dir, v_to)
        empty = schema_df.groupBy(*group_cols).agg(
            F.count(F.lit(1)).alias(count_alias),
            *[F.sum(c).alias(f"sum_{c}") for c in sum_cols],
        )
        return empty.limit(0)
    parts = [p for p in (pos, neg) if p is not None]
    both = parts[0] if len(parts) == 1 else parts[0].unionByName(parts[1])
    return both.groupBy(*group_cols).agg(
        F.sum(count_alias).alias(count_alias),
        *[F.sum(f"sum_{c}").alias(f"sum_{c}") for c in sum_cols],
    )
