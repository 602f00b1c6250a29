"""The transaction log as a REAL Structured Streaming source.

``spark.readStream.format("txlog_changes").option("path", d).load()``
returns a live change-data-feed DataFrame — usable with watermarks,
windowed/stateful aggregation, stream-stream joins and every built-in
sink — implemented as a Spark 4 Python ``DataSourceStreamReader``:

- **Offsets are table versions, checkpointed by Spark.** The driver
  plans each micro-batch from MANIFESTS ALONE (no data IO); restart
  resumes from the engine's own offset log. This replaces the
  driver-side pull loop of :func:`streaming.cdf_source.start_cdf_stream`
  for consumers that want a first-class source rather than a
  foreachBatch sink — the rate-tick wrapper remains for the
  exactly-once txlog→txlog sinks, which carry their own transactional
  cursor by design.
- **Reads run on EXECUTORS, Arrow-batched.** Each planned
  ``InputPartition`` names one data file (plus its deletion-vector
  sidecars) or one delta-sized commit diff; the worker reconstructs
  rows with pyarrow under the same read contract as
  :func:`operators.txlog.snapshot` — column mapping (RENAME/DROP)
  physical→logical translation, hive partition values re-derived from
  entry paths, NULL-fill + lossless type widening to the stream's
  declared schema, DV positions masked out.
- **Feed semantics match** :func:`operators.txlog.table_changes`:
  commits ``from+1..to`` yield rows tagged ``_change_type``
  (insert | delete), ``_commit_version``, ``_commit_op``; rewrite
  commits (compact / optimize / DV compaction / row-tracking
  enablement) contribute nothing; a feed starting at a
  :func:`truncate_history` horizon serves the horizon's full file
  list as the initial-snapshot insert set — Delta's
  snapshot-then-tail stream shape, for free, from the self-contained
  horizon manifest. One deliberate divergence: a stream has ONE
  declared schema, so rows from before a rename serve under the
  CURRENT column name (the rename is a schema-level identity —
  Delta's column-mapping read), where the version-faithful batch
  ``table_changes`` keeps each commit's own names.

Partition granularity is the scale argument: append commits and pure
DV-delete commits — the high-volume paths — plan ONE PARTITION PER
FILE (parallel across the cluster). General rewrite-diff commits
(COW delete / UPDATE / merge) ALSO plan per-file when the table is
row-tracked: each touched file nets itself against the opposite
side's rid-range-overlapping files by stable row id
(:func:`_plan_rid_diff` — exact because live ids are unique per
side), so a bulk UPDATE's feed read scales with the cluster instead
of funneling one Python task. Only rewrite commits on UNTRACKED
tables keep the single-partition multiset ``exceptAll`` (its
semantics are not partition-local without row identity), behind a
``maxDiffRows`` guard that raises with guidance rather than silently
single-tasking a table-sized rewrite. The decomposition of
a pure DV-delete commit into per-file position deltas is exact: its
add multiset is a sub-multiset of its remove multiset, so the global
``exceptAll`` difference is precisely the per-file ``new_dv − old_dv``
position rows.

When to use WHICH read surface: ``txlog_table`` / ``txlog_changes``
are the INTEROP surface (SQL views, time travel options, streaming
offsets managed by the engine) and cross the Python↔Arrow boundary
per batch; bulk analytical reads should prefer
:func:`operators.txlog.snapshot`, whose plan is a JVM-native parquet
scan with pushdown/pruning (measured in PERF.md — same result, no
Arrow interop tax).

Schema evolution mid-stream raises (restart to pick up the widened
schema — Delta's behavior); evolution BEFORE the consumed range
NULL-fills, and lossless type widenings cast up to the declared
schema.

The same planner also backs a batch reader:
``spark.read.format("txlog_changes").option("path", d)
.option("fromVersion", v).load()``.
"""

from __future__ import annotations

import json
import os
import re
from typing import Iterator
from urllib.parse import unquote

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

_SOURCE_NAME = "txlog_changes"

#: ops whose commits rewrite rows without changing any — skipped by
#: the feed (same set as operators.txlog.table_changes)
_REWRITE_OPS = (
    "compact",
    "optimize",
    "optimize_small",
    "compact_dv",
    "analyze",
    "rowtrack_enable",
)

_CDF_FIELDS = [
    ("_change_type", "string"),
    ("_commit_version", "long"),
    ("_commit_op", "string"),
]


# ---------------------------------------------------------------------------
# planning (driver): manifests → partition payloads. No data IO.
# ---------------------------------------------------------------------------


def _declared_fields(table_dir: str, version: int) -> list[dict]:
    from etl_sentinel_imagery_spark.operators.txlog import resolve_schema

    sj = resolve_schema(table_dir, version)
    if not sj:
        raise ValueError(
            f"{table_dir} has no recorded schema at version {version}; "
            "the txlog_changes source requires schema-recorded tables "
            "(any init_table/append since schema recording landed)"
        )
    return json.loads(sj)["fields"]


def _entry_pair(e) -> tuple[str, list[str]]:
    from etl_sentinel_imagery_spark.operators.txlog import (
        _entry_dvs,
        _entry_name,
    )

    return _entry_name(e), list(_entry_dvs(e))


def _bindings(table_dir: str, version: int) -> dict[str, str]:
    """logical name → PHYSICAL column binding at ``version``."""
    from etl_sentinel_imagery_spark.operators.txlog import (
        resolve_mapping,
    )

    mp = resolve_mapping(table_dir, version)["map"]
    return {
        f["name"]: mp.get(f["name"], f["name"])
        for f in _declared_fields(table_dir, version)
    }


def _rid_span(table_dir: str, e) -> tuple[int | None, int | None]:
    """[lo, hi] row-id range a file entry CAN hold, from metadata
    alone where possible: a position-derived entry spans exactly
    ``[base_rid, base_rid + rows - 1]`` (manifest row count — no IO);
    a materialized-rid entry reads ONLY its parquet footer (row-group
    min/max statistics of the physical ``_row_id`` column). ``(None,
    None)`` = unknown (footer lacks stats) — callers must treat it as
    overlapping everything (conservative, never wrong)."""
    from etl_sentinel_imagery_spark.operators.txlog import (
        _entry_name,
        _entry_rows,
    )

    if isinstance(e, dict) and e.get("rid"):
        import pyarrow.parquet as pq

        path = os.path.join(table_dir, _entry_name(e))
        md = pq.ParquetFile(path).metadata
        idx = next(
            (
                i
                for i in range(md.num_columns)
                if md.schema.column(i).name == "_row_id"
            ),
            None,
        )
        if idx is None:
            return (None, None)
        lo = hi = None
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            if st is None or not st.has_min_max:
                return (None, None)
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
        return (lo, hi)
    base = e.get("base_rid") if isinstance(e, dict) else None
    if base is None:
        return (None, None)
    return (base, base + _entry_rows(table_dir, e) - 1)


def _rid_info(table_dir: str, e) -> dict:
    from etl_sentinel_imagery_spark.operators.txlog import (
        _entry_dvs,
        _entry_name,
    )

    lo, hi = _rid_span(table_dir, e)
    return {
        "name": _entry_name(e),
        "dvs": list(_entry_dvs(e)),
        "rid": bool(e.get("rid")) if isinstance(e, dict) else False,
        "base_rid": e.get("base_rid") if isinstance(e, dict) else None,
        "lo": lo,
        "hi": hi,
    }


def _spans_overlap(a: dict, b: dict) -> bool:
    if a["lo"] is None or b["lo"] is None:
        return True  # unknown span: conservative
    return not (a["hi"] < b["lo"] or b["hi"] < a["lo"])


def _plan_rid_diff(
    table_dir: str,
    v: int,
    op: str,
    add_entries: list,
    rem_entries: list,
    parent: int,
) -> list[dict] | None:
    """PER-FILE partitions for a general rewrite commit on a
    ROW-TRACKED table, or ``None`` when the commit can't take the rid
    path (tracking off at the parent, or an entry without id
    provenance). Each touched file becomes one partition that nets
    ITSELF against the opposite side's rid-range-overlapping files:
    an add file emits inserts for rows whose stable id is absent from
    (or value-changed vs) the removed files it overlaps; a remove
    file symmetrically emits deletes. Exact because live row ids are
    unique on each side of the commit — a row's id appears in at most
    one add file and at most one removed file, so membership+equality
    against the overlap set IS the global net diff, computed
    partition-locally (round-6 verdict #1: the multiset-``exceptAll``
    single task becomes one task per touched file; a bulk UPDATE's
    feed read now scales with the cluster like the append path).
    Range matching has no false negatives: spans come from manifest
    ``base_rid``+rows or parquet footer stats, and an UNKNOWN span
    overlaps everything (degraded parallel IO, never wrong rows)."""
    from etl_sentinel_imagery_spark.operators.txlog import (
        resolve_row_tracking,
    )

    if not resolve_row_tracking(table_dir, parent):
        return None

    def ok(e):
        return isinstance(e, dict) and (
            e.get("rid") or e.get("base_rid") is not None
        )

    if not all(ok(e) for e in add_entries + rem_entries):
        return None
    adds = [_rid_info(table_dir, e) for e in add_entries]
    rems = [_rid_info(table_dir, e) for e in rem_entries]
    parts = []
    for a in adds:
        parts.append(
            {
                "kind": "rid_add",
                "file": a,
                "others": [r for r in rems if _spans_overlap(a, r)],
                "v": v,
                "op": op,
            }
        )
    for r in rems:
        parts.append(
            {
                "kind": "rid_remove",
                "file": r,
                "others": [a for a in adds if _spans_overlap(r, a)],
                "v": v,
                "op": op,
            }
        )
    return parts


def plan_change_partitions(
    table_dir: str,
    from_version: int,
    to_version: int,
    declared: dict[str, str],
    include_rewrites: bool = False,
    pinned_version: int | None = None,
    max_diff_rows: int = 5_000_000,
) -> list[dict]:
    """Classify commits ``from_version+1..to_version`` into partition
    payloads (pure dicts — picklable, no Spark objects):

    - ``insert``: one per added file of an append-style commit (no
      removes; includes init / truncate-horizon full-list manifests).
    - ``dv_delta``: one per touched file of a pure DV-delete commit
      (every removed name re-added with an extended sidecar chain,
      nothing else added) — deletes are the file's rows at positions
      ``new_dv − old_dv``. The decomposition is exact because such a
      commit's add multiset is a sub-multiset of its remove multiset.
    - ``rid_add`` / ``rid_remove``: one per touched file of a general
      rewrite commit (COW delete / UPDATE / merge) on a ROW-TRACKED
      table — partition-local netting by stable row id against the
      rid-range-overlapping files of the opposite side
      (:func:`_plan_rid_diff`); the rewrite path parallelizes like
      the append path.
    - ``diff``: a remaining rewrite commit on an UNTRACKED table: the
      commit's full add/remove entry lists for an executor-side
      multiset diff in ONE task. Delta-sized by design, and guarded:
      a commit whose touched manifest row count exceeds
      ``max_diff_rows`` raises with guidance (enable row tracking, or
      raise ``maxDiffRows``) instead of silently funneling a
      table-sized rewrite through a single core.

    Every entry is read under the DECLARED (stream-start / batch
    ``toVersion``) logical→physical bindings — a rename is a
    schema-level identity, so historical values serve under the
    current name (Delta's column-mapping read). History at or before
    ``pinned_version`` (the version the declared schema came from) is
    consistent by the mapping discipline: renamed columns serve under
    their current name, dropped-then-re-added lineages NULL-fill old
    files because the fresh physical identity is never present there.
    A commit AFTER the pin that breaks a binding — a new column, a
    rename, or a re-add minting a fresh physical — raises: restart
    the stream to adopt the new schema (Delta's behavior). A plain
    DROP is benign (the declared column NULL-fills on later files)."""
    from etl_sentinel_imagery_spark.operators.txlog import (
        _entries_from_parts,
        _has_full_list,
        read_manifest,
        resolve_files,
    )

    pin = to_version if pinned_version is None else pinned_version
    parts: list[dict] = []
    for v in range(max(from_version + 1, 0), to_version + 1):
        m = read_manifest(table_dir, v)
        op = m.get("op", "")
        if op in _REWRITE_OPS and not include_rewrites:
            continue
        if v > pin:
            for name, phys in _bindings(table_dir, v).items():
                if declared.get(name) != phys:
                    raise ValueError(
                        f"commit {v} binds column {name!r} to physical "
                        f"{phys!r}, outside the stream's declared "
                        "schema (new/renamed/re-added column); restart "
                        "the stream to adopt the new schema"
                    )
        # the range's FIRST commit being self-contained (init commit,
        # or a truncate_history horizon — parent=None with the full
        # resolved list embedded) serves as the initial-snapshot
        # insert set; every later commit contributes its delta
        snapshot_start = (
            v == max(from_version + 1, 0)
            and m.get("parent") is None
            and _has_full_list(m)
        )
        if ("adds" in m or "removes" in m) and not snapshot_start:
            adds = [_entry_pair(e) for e in m.get("adds", [])]
            remove_names = list(m.get("removes", []))
        else:
            full = (
                list(
                    _entries_from_parts(
                        table_dir, m["files_parts"]
                    ).values()
                )
                if "files_parts" in m
                else m.get("files", [])
            )
            adds = [_entry_pair(e) for e in full]
            remove_names = []
        if not remove_names:
            parts += [
                {"kind": "insert", "name": n, "dvs": d, "v": v, "op": op}
                for n, d in adds
            ]
            continue
        parent = m["parent"]
        parent_full = {
            _entry_pair(e)[0]: e for e in resolve_files(table_dir, parent)
        }
        parent_by_name = {
            n: _entry_pair(e)[1] for n, e in parent_full.items()
        }
        removes = [(n, parent_by_name[n]) for n in remove_names]
        add_names = {n for n, _ in adds}
        pure_dv = set(remove_names) == add_names and all(
            d[: len(parent_by_name[n])] == parent_by_name[n]
            and len(d) > len(parent_by_name[n])
            for n, d in adds
        )
        if pure_dv:
            parts += [
                {
                    "kind": "dv_delta",
                    "name": n,
                    "old_dvs": parent_by_name[n],
                    "new_dvs": d,
                    "v": v,
                    "op": op,
                }
                for n, d in adds
            ]
            continue
        rid_parts = _plan_rid_diff(
            table_dir,
            v,
            op,
            list(m.get("adds", [])),
            [parent_full[n] for n in remove_names],
            parent,
        )
        if rid_parts is not None:
            parts += rid_parts
            continue
        from etl_sentinel_imagery_spark.operators.txlog import (
            _entry_rows,
        )

        touched = sum(
            _entry_rows(table_dir, e)
            for e in list(m.get("adds", []))
            + [parent_full[n] for n in remove_names]
        )
        if touched > max_diff_rows:
            raise ValueError(
                f"commit {v} ({op}) touches {touched} rows on an "
                "untracked table; its net diff would run as ONE task. "
                "Enable row tracking (enable_row_tracking) for "
                "per-file parallel rewrite feeds, or raise "
                ".option('maxDiffRows', ...) to accept the "
                "single-task diff"
            )
        parts.append(
            {
                "kind": "diff",
                "adds": adds,
                "removes": removes,
                "v": v,
                "op": op,
            }
        )
    return parts


# ---------------------------------------------------------------------------
# reading (executor): payload + pyarrow → RecordBatches. No Spark session.
# ---------------------------------------------------------------------------


def _arrow_type(spark_json_type):
    """Spark schema-JSON type → arrow type, via pyspark's own
    converter (so the batches match what the DataSource Arrow path
    expects for the declared schema)."""
    from pyspark.sql.pandas.types import to_arrow_type
    from pyspark.sql.types import StructType

    st = StructType.fromJson(
        {
            "type": "struct",
            "fields": [
                {
                    "name": "c",
                    "type": spark_json_type,
                    "nullable": True,
                    "metadata": {},
                }
            ],
        }
    )
    return to_arrow_type(st.fields[0].dataType)


def _partition_values(name: str) -> dict[str, str | None]:
    """Hive ``col=value`` segments of an entry's relative path."""
    out: dict[str, str | None] = {}
    for seg in name.split(os.sep)[:-1]:
        if "=" in seg:
            c, _, val = seg.partition("=")
            out[c] = (
                None
                if val == "__HIVE_DEFAULT_PARTITION__"
                else unquote(val)
            )
    return out


def _dv_positions(table_dir: str, name: str, dv_paths: list[str]) -> set:
    """Row positions deleted from ``name`` across a sidecar chain.
    Matched on the FULL recorded name via the same candidate set the
    DataFrame read path uses (``txlog._dv_row_candidates``): exact on
    converted directories where basenames legally recur across
    partition leaves, and still valid across a clone's re-rooted
    entry names."""
    import pyarrow.parquet as pq

    from etl_sentinel_imagery_spark.operators.txlog import (
        _dv_row_candidates,
    )

    cands = _dv_row_candidates(table_dir, name, dv_paths)
    drop: set[int] = set()
    for p in dv_paths:
        t = pq.read_table(
            os.path.join(table_dir, p), columns=["file_name", "pos"]
        )
        for fn, pos in zip(
            t.column("file_name").to_pylist(),
            t.column("pos").to_pylist(),
        ):
            if fn in cands:
                drop.add(pos)
    return drop


def _read_entry_arrow(
    table_dir: str,
    name: str,
    fields: list[dict],
    mp: dict[str, str],
    positions: set | None = None,
    anti_positions: set | None = None,
    rid_info: dict | None = None,
):
    """One data file → a pyarrow Table in the DECLARED logical schema
    (physical→logical rename via the declared bindings, hive partition
    values from the path, NULL-fill for pre-evolution files, lossless
    widening casts). ``anti_positions`` masks DV-deleted rows out
    (snapshot semantics); ``positions`` selects exactly those row
    positions instead (the DV-delta delete read). With ``rid_info``
    (an entry info dict from :func:`_rid_info`) the return value is a
    ``(table, row_ids)`` pair — ids from the materialized physical
    ``_row_id`` column when the entry is marked ``rid``, else
    ``base_rid + physical position`` (positions BEFORE any DV mask,
    the same derivation as the DataFrame ``keep_rid`` read)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(table_dir, name))
    sel: list[int] | None = None
    if positions is not None:
        sel = sorted(p for p in positions if p < t.num_rows)
    elif anti_positions:
        keep = [i for i in range(t.num_rows) if i not in anti_positions]
        if len(keep) != t.num_rows:
            sel = keep
    rids: list[int] | None = None
    if rid_info is not None:
        if rid_info.get("rid"):
            col = t.column("_row_id")
            rids = (
                col.take(pa.array(sel, pa.int64())).to_pylist()
                if sel is not None
                else col.to_pylist()
            )
        else:
            base = rid_info["base_rid"]
            rids = [
                base + p
                for p in (sel if sel is not None else range(t.num_rows))
            ]
    if sel is not None:
        t = t.take(pa.array(sel, pa.int64()))
    pvals = _partition_values(name)
    cols, arrow_fields = [], []
    for f in fields:
        at = _arrow_type(f["type"])
        phys = mp.get(f["name"], f["name"])
        if phys in t.column_names:
            col = t.column(phys)
            if col.type != at:
                col = pc.cast(col, at)  # lossless widening contract
        elif f["name"] in pvals:
            v = pvals[f["name"]]
            col = pc.cast(
                pa.array([v] * t.num_rows, pa.string()), at
            )
        else:
            col = pa.nulls(t.num_rows, type=at)
        cols.append(col)
        arrow_fields.append(pa.field(f["name"], at))
    out = pa.table(dict(zip([f.name for f in arrow_fields], cols)))
    return (out, rids) if rid_info is not None else out


def _tag(table, change_type: str, payload: dict):
    """Append the CDF columns — the read already produced the declared
    logical schema, so tagging completes the fixed output shape."""
    import pyarrow as pa

    n = table.num_rows
    return table.append_column(
        "_change_type", pa.array([change_type] * n, pa.string())
    ).append_column(
        "_commit_version",
        pa.array([payload["v"]] * n, pa.int64()),
    ).append_column(
        "_commit_op", pa.array([payload["op"]] * n, pa.string())
    )


# Spark's set operations compare NaN EQUAL to NaN (SQL distinct
# semantics); Python's NaN is never == itself and (3.10+) hashes by
# object identity, so raw NaNs would make equal rows look distinct in
# both local diff paths. Normalize to a sentinel for hashing and use
# NaN-aware equality for netting (round-7 ADVICE).
_NAN_KEY = ("__txlog_nan__",)


def _hashable(v):
    if isinstance(v, float) and v != v:
        return _NAN_KEY
    if isinstance(v, list):
        return tuple(_hashable(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _hashable(x)) for k, x in v.items()))
    return v


def _values_differ(a, b) -> bool:
    """NaN-aware deep inequality (NaN == NaN, recursing into
    lists/structs) — matches ``exceptAll``'s comparison, so the rid
    path nets exactly the rows the untracked diff path would."""
    if a is b:
        return False
    if isinstance(a, float) and isinstance(b, float):
        return not (a == b or (a != a and b != b))
    if isinstance(a, list) and isinstance(b, list):
        return len(a) != len(b) or any(
            _values_differ(x, y) for x, y in zip(a, b)
        )
    if isinstance(a, dict) and isinstance(b, dict):
        return a.keys() != b.keys() or any(
            _values_differ(v, b[k]) for k, v in a.items()
        )
    return a != b


def _multiset_diff(adds_tbl, removes_tbl):
    """Exact multiset ``exceptAll`` both ways over two SAME-SCHEMA
    arrow tables (the general rewrite-diff commit). Cost is the
    commit's touched-row count — delta-sized by the write paths'
    design."""
    from collections import Counter

    import pyarrow as pa

    def rows(t):
        return [
            tuple(_hashable(v) for v in r)
            for r in zip(*[c.to_pylist() for c in t.columns])
        ] if t.num_columns else []

    a_rows, r_rows = rows(adds_tbl), rows(removes_tbl)
    counts = Counter(a_rows)
    counts.subtract(r_rows)
    ins_idx, del_idx = [], []
    seen: Counter = Counter()
    for i, r in enumerate(a_rows):
        if counts[r] > 0 and seen[r] < counts[r]:
            seen[r] += 1
            ins_idx.append(i)
    seen = Counter()
    for i, r in enumerate(r_rows):
        if counts[r] < 0 and seen[r] < -counts[r]:
            seen[r] += 1
            del_idx.append(i)
    take = lambda t, idx: t.take(pa.array(idx, pa.int64()))  # noqa: E731
    return take(adds_tbl, ins_idx), take(removes_tbl, del_idx)


def _rid_net_indexes(t, rids, others) -> list[int]:
    """Row indexes of ``t`` to EMIT: rows whose stable id is absent
    from every opposite-side table, or present with DIFFERENT values
    (the update pre/post image). Present-and-equal rows net away —
    exactly the multiset-``exceptAll`` result, computed locally
    because ids are unique per side. Value comparison happens in the
    shared declared schema via python values (null-safe: None == None;
    nested lists/structs compare by value), and columns materialize
    LAZILY — a pure insert/delete file whose ids never collide does
    no value work at all."""
    lookup: dict = {}
    for ti, (ot, om) in enumerate(others):
        for rid, oi in om.items():
            lookup[rid] = (ti, oi)
    emit: list[int] = []
    cols_self = None
    cols_other: dict[int, list] = {}
    for i, rid in enumerate(rids):
        hit = lookup.get(rid)
        if hit is None:
            emit.append(i)
            continue
        ti, oi = hit
        if cols_self is None:
            cols_self = [c.to_pylist() for c in t.columns]
        oc = cols_other.get(ti)
        if oc is None:
            oc = cols_other[ti] = [
                c.to_pylist() for c in others[ti][0].columns
            ]
        if any(
            _values_differ(cs[i], co[oi])
            for cs, co in zip(cols_self, oc)
        ):
            emit.append(i)
    return emit


def _read_rid_partition(
    table_dir: str,
    payload: dict,
    declared_fields: list[dict],
    mapping: dict[str, str],
):
    """One ``rid_add`` / ``rid_remove`` partition → the tagged arrow
    table of its net rows (or None)."""
    import pyarrow as pa

    def load(info):
        return _read_entry_arrow(
            table_dir,
            info["name"],
            declared_fields,
            mapping,
            anti_positions=_dv_positions(
                table_dir, info["name"], info["dvs"]
            )
            if info["dvs"]
            else None,
            rid_info=info,
        )

    t, rids = load(payload["file"])
    if not t.num_rows:
        return None
    others = []
    for o in payload["others"]:
        ot, orids = load(o)
        others.append((ot, {r: i for i, r in enumerate(orids)}))
    emit = _rid_net_indexes(t, rids, others)
    if not emit:
        return None
    out = t.take(pa.array(emit, pa.int64()))
    tag = "insert" if payload["kind"] == "rid_add" else "delete"
    return _tag(out, tag, payload)


def read_change_partition(
    table_dir: str,
    payload: dict,
    declared_fields: list[dict],
    mapping: dict[str, str],
) -> Iterator:
    """Executor entry point: one partition payload → RecordBatches in
    the declared output schema."""
    kind = payload["kind"]
    if kind == "insert":
        t = _read_entry_arrow(
            table_dir,
            payload["name"],
            declared_fields,
            mapping,
            anti_positions=_dv_positions(
                table_dir, payload["name"], payload["dvs"]
            )
            if payload["dvs"]
            else None,
        )
        out = _tag(t, "insert", payload)
    elif kind == "dv_delta":
        new = _dv_positions(
            table_dir, payload["name"], payload["new_dvs"]
        )
        old = _dv_positions(
            table_dir, payload["name"], payload["old_dvs"]
        )
        t = _read_entry_arrow(
            table_dir,
            payload["name"],
            declared_fields,
            mapping,
            positions=new - old,
        )
        out = _tag(t, "delete", payload)
    elif kind in ("rid_add", "rid_remove"):
        out = _read_rid_partition(
            table_dir, payload, declared_fields, mapping
        )
        if out is None:
            return
    elif kind == "diff":
        import pyarrow as pa

        def side(entries):
            tabs = [
                _read_entry_arrow(
                    table_dir,
                    n,
                    declared_fields,
                    mapping,
                    anti_positions=_dv_positions(table_dir, n, dvs)
                    if dvs
                    else None,
                )
                for n, dvs in entries
            ]
            return pa.concat_tables(tabs) if tabs else None

        a = side(payload["adds"])
        r = side(payload["removes"])
        if a is None and r is None:
            return
        if r is None:
            ins, dels = a, None
        elif a is None:
            ins, dels = None, r
        else:  # both sides share the declared schema: diff directly
            ins, dels = _multiset_diff(a, r)
        parts = []
        if ins is not None and ins.num_rows:
            parts.append(_tag(ins, "insert", payload))
        if dels is not None and dels.num_rows:
            parts.append(_tag(dels, "delete", payload))
        if not parts:
            return
        out = pa.concat_tables(parts)
    else:  # pragma: no cover
        raise AssertionError(f"unknown partition kind {kind!r}")
    if out.num_rows:
        yield from out.to_batches(max_chunksize=65536)


# ---------------------------------------------------------------------------
# the DataSource
# ---------------------------------------------------------------------------


def _full_schema_json(table_dir: str, version: int) -> list[dict]:
    return _declared_fields(table_dir, version)


class TxlogChangesStreamReader(DataSourceStreamReader):
    """Micro-batch planner over committed versions. An offset
    ``{"version": v}`` means every commit ≤ v has been delivered."""

    def __init__(self, schema, options, pinned_head: int | None = None):
        self.table_dir = options.get("path") or options.get("table_dir")
        if not self.table_dir:
            raise ValueError("txlog_changes requires .option('path', ...)")
        from etl_sentinel_imagery_spark.operators.txlog import (
            current_version,
        )

        self.include_rewrites = (
            str(options.get("includerewrites", "false")).lower() == "true"
        )
        self.max_versions = options.get("maxversionspertrigger")
        self.max_files = options.get("maxfilespertrigger")
        self.max_bytes = options.get("maxbytespertrigger")
        self.max_diff_rows = int(options.get("maxdiffrows", "5000000"))
        # the head the DataSource's schema() already pinned — resolving
        # a SECOND current_version here would let a schema-evolving
        # commit land between the two calls and make the declared
        # relation schema disagree with the reader's bindings (round-6
        # advice, low): first micro-batch fails with a confusing shape
        # mismatch. One pin, shared.
        head = (
            pinned_head
            if pinned_head is not None
            else current_version(self.table_dir)
        )
        from etl_sentinel_imagery_spark.operators.txlog import (
            check_read_protocol,
        )

        check_read_protocol(self.table_dir, head)
        sv = str(options.get("startingversion", "0"))
        # "latest": only commits AFTER stream start (offset = head)
        self.start_version = head + 1 if sv == "latest" else int(sv)
        # the stream's declared schema + column bindings are pinned at
        # start; a commit that rebinds raises at planning time
        # (restart to adopt)
        self.fields = _full_schema_json(self.table_dir, head)
        self.bindings = _bindings(self.table_dir, head)
        self.pinned = head
        # maxVersionsPerTrigger admission control lives in
        # latestOffset (clamping in partitions() would DROP rows —
        # the checkpoint still advances to `end`). The cursor learns
        # the true consumed offset from partitions(); initialOffset
        # seeds it on a FRESH stream so the very first micro-batch —
        # the backlog-drain case the caps exist for — is capped too
        # (round-10 advice, low). Only the first planned batch after
        # a RESTART with no pending batch remains uncapped: Spark
        # skips initialOffset there and the checkpointed offset is
        # not exposed to the reader until partitions(); clamping from
        # start_version-1 instead could move latestOffset BEHIND the
        # checkpoint and re-deliver consumed versions.
        self._cursor: int | None = None

    def initialOffset(self):
        # called exactly once, on an EMPTY checkpoint — this IS the
        # consumed offset, so the admission caps bound batch one
        self._cursor = self.start_version - 1
        return {"version": self.start_version - 1}

    def latestOffset(self):
        from etl_sentinel_imagery_spark.operators.txlog import (
            current_version,
        )

        head = current_version(self.table_dir)
        if self.max_versions is not None and self._cursor is not None:
            head = min(head, self._cursor + int(self.max_versions))
        if (
            self.max_files is not None or self.max_bytes is not None
        ) and self._cursor is not None:
            head = self._admit_by_size(self._cursor, head)
        return {"version": head}

    def _admit_by_size(self, cursor: int, head: int) -> int:
        """Delta's ``maxFilesPerTrigger`` / ``maxBytesPerTrigger``:
        clamp the batch end so the PENDING commits' added-file count /
        bytes stay under the caps — admission control so a backlogged
        stream (restart after downtime, a bulk backfill upstream)
        drains in bounded micro-batches instead of one giant one.
        Version-granular (offsets are versions): the first version
        over the cap is the cut, and at least ONE version is always
        admitted so the stream can never stall. Driver-side manifest
        reads only — O(pending commits), no data IO."""
        from etl_sentinel_imagery_spark.operators.txlog import (
            read_manifest,
        )

        max_f = None if self.max_files is None else int(self.max_files)
        max_b = None if self.max_bytes is None else int(self.max_bytes)
        files = 0
        tot = 0
        for v in range(cursor + 1, head + 1):
            m = read_manifest(self.table_dir, v)
            adds = m.get("adds")
            if adds is None:
                # full-list manifest (init / truncate horizon): the
                # planner emits every live file as inserts
                adds = m.get("files") or []
            files += len(adds)
            tot += sum(
                int(e.get("bytes", 0))
                for e in adds
                if isinstance(e, dict)
            )
            over = (max_f is not None and files > max_f) or (
                max_b is not None and tot > max_b
            )
            if over and v > cursor + 1:
                return v - 1
        return head

    def partitions(self, start, end):
        lo, hi = start["version"], end["version"]
        # max(): a replayed/degenerate batch must never move the
        # admission cursor BEHIND the checkpointed start — a backward
        # cursor would re-admit consumed versions at the next clamp
        self._cursor = max(lo, hi)
        payloads = plan_change_partitions(
            self.table_dir,
            lo,
            hi,
            self.bindings,
            self.include_rewrites,
            pinned_version=self.pinned,
            max_diff_rows=self.max_diff_rows,
        )
        if not payloads:
            # Spark requires ≥1 partition per planned batch
            return [InputPartition({"kind": "empty"})]
        return [InputPartition(p) for p in payloads]

    def read(self, partition) -> Iterator:
        p = partition.value
        if p.get("kind") == "empty":
            return iter(())
        return read_change_partition(
            self.table_dir, p, self.fields, self.bindings
        )

    def commit(self, end):
        pass


class TxlogChangesBatchReader(DataSourceReader):
    """Batch twin over an explicit version range (``fromVersion`` /
    ``toVersion`` options) — same planner, same executor reads."""

    def __init__(self, schema, options, pinned_head: int | None = None):
        self.table_dir = options.get("path") or options.get("table_dir")
        if not self.table_dir:
            raise ValueError("txlog_changes requires .option('path', ...)")
        from etl_sentinel_imagery_spark.operators.txlog import (
            current_version,
        )

        self.from_version = int(options.get("fromversion", "-1"))
        tv = options.get("toversion")
        # same single-pin rule as the stream reader: reuse the head
        # schema() resolved rather than racing a concurrent commit
        self.to_version = (
            (
                pinned_head
                if pinned_head is not None
                else current_version(self.table_dir)
            )
            if tv is None
            else int(tv)
        )
        self.include_rewrites = (
            str(options.get("includerewrites", "false")).lower() == "true"
        )
        self.max_diff_rows = int(options.get("maxdiffrows", "5000000"))
        from etl_sentinel_imagery_spark.operators.txlog import (
            check_read_protocol,
        )

        check_read_protocol(self.table_dir, self.to_version)
        self.fields = _full_schema_json(self.table_dir, self.to_version)
        self.bindings = _bindings(self.table_dir, self.to_version)
        self.options = options or {}
        self._preds: list = []

    #: the change types each partition kind can EMIT — a filter on
    #: _change_type prunes whole partitions whose kind cannot
    #: contribute (a dv_delta partition never yields an insert)
    _KIND_EMITS = {
        "insert": {"insert"},
        "rid_add": {"insert"},
        "dv_delta": {"delete"},
        "rid_remove": {"delete"},
        "diff": {"insert", "delete"},
    }

    def pushFilters(self, filters):
        """Feed-side partition pruning (round-10): ``_change_type``
        equality/In keeps only partitions whose kind can emit a
        matching row (the common consume-inserts-only pattern skips
        every delete partition), and ``_commit_version``
        equality/ranges prune by each partition's commit. Filters
        return UNCONSUMED — Spark re-applies them row-level, so
        pruning is never a correctness dependency."""
        from pyspark.sql.datasource import (
            EqualTo,
            GreaterThan,
            GreaterThanOrEqual,
            In,
            LessThan,
            LessThanOrEqual,
        )

        for f in filters:
            attr = getattr(f, "attribute", None)
            if not attr or len(attr) != 1:
                continue
            col = attr[0]
            if col not in ("_change_type", "_commit_version"):
                continue
            if isinstance(f, EqualTo):
                self._preds.append((col, "in", {f.value}))
            elif isinstance(f, In):
                self._preds.append((col, "in", set(f.value)))
            elif col == "_commit_version":
                if isinstance(f, GreaterThan):
                    self._preds.append((col, "gt", f.value))
                elif isinstance(f, GreaterThanOrEqual):
                    self._preds.append((col, "ge", f.value))
                elif isinstance(f, LessThan):
                    self._preds.append((col, "lt", f.value))
                elif isinstance(f, LessThanOrEqual):
                    self._preds.append((col, "le", f.value))
        return filters

    def _keep(self, p: dict) -> bool:
        emits = self._KIND_EMITS.get(p.get("kind"))
        v = p.get("v")
        for col, kind, value in self._preds:
            try:
                if col == "_change_type":
                    if emits is not None and not (emits & value):
                        return False
                elif v is not None:
                    if kind == "in" and v not in value:
                        return False
                    if kind == "gt" and v <= value:
                        return False
                    if kind == "ge" and v < value:
                        return False
                    if kind == "lt" and v >= value:
                        return False
                    if kind == "le" and v > value:
                        return False
            except TypeError:
                continue
        return True

    def partitions(self):
        payloads = plan_change_partitions(
            self.table_dir,
            self.from_version,
            self.to_version,
            self.bindings,
            self.include_rewrites,
            max_diff_rows=self.max_diff_rows,
        )
        n_before = len(payloads)
        if self._preds:
            payloads = [p for p in payloads if self._keep(p)]
        log = self.options.get("prunelog")
        if log and self._preds:
            try:
                with open(log, "a") as fh:
                    fh.write(
                        json.dumps(
                            {
                                "parts_total": n_before,
                                "parts_planned": len(payloads),
                            }
                        )
                        + chr(10)
                    )
            except OSError:
                pass
        return [InputPartition(p) for p in payloads] or [
            InputPartition({"kind": "empty"})
        ]

    def read(self, partition) -> Iterator:
        p = partition.value
        if p.get("kind") == "empty":
            return iter(())
        return read_change_partition(
            self.table_dir, p, self.fields, self.bindings
        )


class TxlogChangesDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return _SOURCE_NAME

    def schema(self):
        from pyspark.sql.types import StructType

        table_dir = self.options.get("path") or self.options.get(
            "table_dir"
        )
        if not table_dir:
            raise ValueError("txlog_changes requires .option('path', ...)")
        from etl_sentinel_imagery_spark.operators.txlog import (
            current_version,
        )

        tv = self.options.get("toversion")
        v = current_version(table_dir) if tv is None else int(tv)
        # the reader factories reuse this pin so the declared relation
        # schema and the reader's bindings come from the SAME version
        # (a schema-evolving commit between the two resolutions would
        # otherwise fail the first batch with a shape mismatch). The
        # instance is pickled AFTER schema(), so the pin survives to
        # the planner.
        self._pinned_head = v
        fields = _full_schema_json(table_dir, v) + [
            {
                "name": n,
                "type": t,
                "nullable": True,
                "metadata": {},
            }
            for n, t in _CDF_FIELDS
        ]
        return StructType.fromJson({"type": "struct", "fields": fields})

    def streamReader(self, schema):
        return TxlogChangesStreamReader(
            schema,
            self.options,
            pinned_head=getattr(self, "_pinned_head", None),
        )

    def reader(self, schema):
        return TxlogChangesBatchReader(
            schema,
            self.options,
            pinned_head=getattr(self, "_pinned_head", None),
        )


# ---------------------------------------------------------------------------
# the SNAPSHOT batch source: the table itself as a DataFrame/SQL
# relation — `spark.read.format("txlog_table").option("path", d)` and
# `CREATE TEMPORARY VIEW t USING txlog_table OPTIONS (path '...')`,
# with time travel via `versionAsOf` / `timestampAsOf`. Same executor
# read contract as the change source (column mapping, hive values from
# paths, NULL-fill + widening to the pinned schema, DV anti-masking)
# and the same scale shape: one partition per live data file.
# ---------------------------------------------------------------------------

_TABLE_SOURCE_NAME = "txlog_table"


def _pin_version(table_dir: str, options) -> int:
    from etl_sentinel_imagery_spark.operators.txlog import (
        current_version,
        version_at_timestamp,
    )

    v = options.get("versionasof")
    if v is not None:
        return int(v)
    ts = options.get("timestampasof")
    if ts is not None:
        return version_at_timestamp(table_dir, float(ts))
    return current_version(table_dir)


#: generation-expression shapes whose partition values are MONOTONE
#: functions of the base column — the set Delta derives partition
#: filters from (minus the non-monotone month/day/hour truncations,
#: which a base RANGE cannot bound on their own)
_GEN_SHAPES = [
    (
        re.compile(
            r"(?i)^\s*(?:to_date|date)\s*\(\s*"
            r"([A-Za-z_][A-Za-z0-9_]*)\s*\)\s*$"
        ),
        "date",
    ),
    (
        re.compile(
            r"(?i)^\s*cast\s*\(\s*([A-Za-z_][A-Za-z0-9_]*)"
            r"\s+as\s+date\s*\)\s*$"
        ),
        "date",
    ),
    (
        re.compile(
            r"(?i)^\s*year\s*\(\s*([A-Za-z_][A-Za-z0-9_]*)\s*\)\s*$"
        ),
        "year",
    ),
    (
        re.compile(
            r"(?i)^\s*substring\s*\(\s*([A-Za-z_][A-Za-z0-9_]*)"
            r"\s*,\s*1\s*,\s*(\d+)\s*\)\s*$"
        ),
        "prefix",
    ),
]


def _parse_monotone_generation(expr: str):
    """(converter, base_column) for a recognized monotone generation
    expression, else (None, None). The converter maps a BASE filter
    value to the partition value's on-path representation (ISO date
    string / int year / string prefix) and returns None for value
    types it cannot soundly map."""
    import datetime as _dt

    for pat, kind in _GEN_SHAPES:
        m = pat.match(expr)
        if not m:
            continue
        base = m.group(1)
        if kind == "date":

            def conv(v):
                if isinstance(v, _dt.datetime):
                    return v.date().isoformat()
                if isinstance(v, _dt.date):
                    return v.isoformat()
                if isinstance(v, str) and len(v) >= 10:
                    return v[:10]
                return None

        elif kind == "year":

            def conv(v):
                if isinstance(v, (_dt.datetime, _dt.date)):
                    return v.year
                if isinstance(v, str) and len(v) >= 4:
                    try:
                        return int(v[:4])
                    except ValueError:
                        return None
                return None

        else:  # prefix
            n = int(m.group(2))

            def conv(v, n=n):
                return v[:n] if isinstance(v, str) else None

        return conv, base
    return None, None


class TxlogTableBatchReader(DataSourceReader):
    """Plans ONE partition per live file at the pinned version (plus
    its DV sidecars) — append-heavy tables parallelize across the
    cluster exactly like the parquet source, with the txlog read
    contract applied per partition on the executor.

    This is the INTEROP/SQL surface, not the hot read path: every
    batch crosses the Arrow boundary through a Python worker, and the
    Python DataSource API gives Catalyst no column pruning, so a
    narrow projection still reads every column. Bulk consumers should
    use :func:`operators.txlog.snapshot` (JVM-native parquet relation
    — pruning, pushdown, codegen): measured at 2M rows × 16 files, a
    one-column aggregate runs 0.19 s native vs 0.61 s here (~3×),
    while full-width scans are comparable (`tools/bench_read_paths.py`).
    Pay the boundary only for what it buys — SQL views with time
    travel, and tools that only speak relations."""

    def __init__(self, schema, options, pinned_head: int | None = None):
        self.options = options or {}
        self.table_dir = options.get("path") or options.get("table_dir")
        if not self.table_dir:
            raise ValueError(
                "txlog_table requires .option('path', ...)"
            )
        from etl_sentinel_imagery_spark.operators.txlog import (
            resolve_files,
        )

        self.version = (
            pinned_head
            if pinned_head is not None
            else _pin_version(self.table_dir, options)
        )
        self.fields = _full_schema_json(self.table_dir, self.version)
        self.bindings = _bindings(self.table_dir, self.version)
        self._raw_entries = resolve_files(self.table_dir, self.version)
        from etl_sentinel_imagery_spark.operators.txlog import (
            read_manifest,
        )

        self._partition_cols = (
            read_manifest(self.table_dir, self.version).get(
                "partition_cols"
            )
            or []
        )

    def pushFilters(self, filters):
        """Manifest-side FILE pruning for the interop surface
        (round-10): equality/range/In filters on PARTITION columns
        (typed hive path values) and STAT-tracked columns (per-file
        [min, max]) shrink the planned partition list before any
        Arrow batch crosses the Python boundary — the same skipping
        ``snapshot_pruned`` does natively, now reachable from a SQL
        view's WHERE clause. Every filter is returned UNCONSUMED so
        Spark re-applies it row-level: pruning here is an
        optimization, never a correctness dependency (a file without
        stats for the column is never pruned)."""
        from pyspark.sql.datasource import (
            EqualNullSafe,
            EqualTo,
            GreaterThan,
            GreaterThanOrEqual,
            In,
            LessThan,
            LessThanOrEqual,
        )

        preds = []  # (col, kind, value)
        for f in filters:
            attr = getattr(f, "attribute", None)
            if not attr or len(attr) != 1:
                continue
            col = attr[0]
            if isinstance(f, (EqualTo, EqualNullSafe)):
                if f.value is not None:
                    preds.append((col, "eq", f.value))
            elif isinstance(f, In):
                preds.append((col, "in", set(f.value)))
            elif isinstance(f, GreaterThan):
                preds.append((col, "gt", f.value))
            elif isinstance(f, GreaterThanOrEqual):
                preds.append((col, "ge", f.value))
            elif isinstance(f, LessThan):
                preds.append((col, "lt", f.value))
            elif isinstance(f, LessThanOrEqual):
                preds.append((col, "le", f.value))
        # derive partition predicates from GENERATED partition
        # columns (Delta's generated-column partition pruning): a
        # filter on the BASE of a monotone generation expression
        # (date truncation, year, string prefix) bounds the partition
        # value too — strict base bounds weaken to inclusive derived
        # bounds (monotone, not strictly), which is sound for pruning
        if preds:
            from etl_sentinel_imagery_spark.operators.txlog import (
                resolve_generated_columns,
            )

            derived = []
            for gcol, expr in resolve_generated_columns(
                self.table_dir, self.version
            ).items():
                if gcol not in self._partition_cols:
                    continue
                conv, base = _parse_monotone_generation(expr)
                if conv is None:
                    continue
                for col, kind, value in preds:
                    if col != base:
                        continue
                    if kind == "in":
                        vs = {conv(v) for v in value}
                        if None not in vs:
                            derived.append((gcol, "in", vs))
                    else:
                        dv = conv(value)
                        if dv is not None:
                            derived.append(
                                (
                                    gcol,
                                    {
                                        "eq": "eq",
                                        "gt": "ge",
                                        "ge": "ge",
                                        "lt": "le",
                                        "le": "le",
                                    }[kind],
                                    dv,
                                )
                            )
            preds += derived
        n_before = len(self._raw_entries)
        if preds:
            self._raw_entries = [
                e
                for e in self._raw_entries
                if self._may_match(e, preds)
            ]
        log = self.options.get("prunelog") if self.options else None
        if log:
            # planning runs in a Python worker process, so the prune
            # decision is otherwise invisible to the driver — the
            # opt-in log line is the observability hook (and the test
            # seam proving Spark actually called this)
            try:
                with open(log, "a") as fh:
                    fh.write(
                        json.dumps(
                            {
                                "files_total": n_before,
                                "files_planned": len(
                                    self._raw_entries
                                ),
                                "n_filters": len(list(filters)),
                            }
                        )
                        + chr(10)
                    )
            except OSError:
                pass
        return filters

    def _may_match(self, e, preds) -> bool:
        """False only when a filter PROVABLY excludes every row of the
        entry — partition value mismatch or a disjoint stats range;
        any doubt (missing stats, incomparable types) keeps the file."""
        from urllib.parse import unquote

        from etl_sentinel_imagery_spark.operators.txlog import (
            _cast_partition_value,
            _entry_name,
        )

        pvals = None
        for col, kind, value in preds:
            lo = hi = None
            if col in self._partition_cols:
                if pvals is None:
                    pvals = {}
                    types = {
                        f["name"]: f["type"]
                        for f in self.fields
                        if isinstance(f["type"], str)
                    }
                    for seg in _entry_name(e).split(os.sep)[:-1]:
                        c, sep, raw = seg.partition("=")
                        if sep:
                            v = (
                                None
                                if raw == "__HIVE_DEFAULT_PARTITION__"
                                else unquote(raw)
                            )
                            pvals[c] = _cast_partition_value(
                                v, types.get(c)
                            )
                if col not in pvals:
                    continue
                lo = hi = pvals[col]
                if lo is None:
                    return False  # NULL partition: no eq/range match
            else:
                stats = (
                    e.get("stats") if isinstance(e, dict) else None
                ) or {}
                st = stats.get(self.bindings.get(col, col))
                if st is None:
                    continue
                lo, hi = st
            try:
                if kind == "eq" and not (lo <= value <= hi):
                    return False
                if kind == "in" and not any(
                    lo <= v <= hi for v in value if v is not None
                ):
                    return False
                if kind == "gt" and hi <= value:
                    return False
                if kind == "ge" and hi < value:
                    return False
                if kind == "lt" and lo >= value:
                    return False
                if kind == "le" and lo > value:
                    return False
            except TypeError:
                continue  # incomparable (e.g. stringified timestamp)
        return True

    def partitions(self):
        return [
            InputPartition({"name": n, "dvs": d})
            for n, d in (
                _entry_pair(e) for e in self._raw_entries
            )
        ] or [InputPartition({"kind": "empty"})]

    def read(self, partition) -> Iterator:
        p = partition.value
        if p.get("kind") == "empty":
            return iter(())
        t = _read_entry_arrow(
            self.table_dir,
            p["name"],
            self.fields,
            self.bindings,
            anti_positions=_dv_positions(
                self.table_dir, p["name"], p["dvs"]
            )
            if p["dvs"]
            else None,
        )
        if not t.num_rows:
            return iter(())
        return iter(t.to_batches(max_chunksize=65536))


class TxlogTableDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return _TABLE_SOURCE_NAME

    def schema(self):
        from pyspark.sql.types import StructType

        table_dir = self.options.get("path") or self.options.get(
            "table_dir"
        )
        if not table_dir:
            raise ValueError(
                "txlog_table requires .option('path', ...)"
            )
        v = _pin_version(table_dir, self.options)
        self._pinned_head = v  # reader reuses: one resolution per scan
        return StructType.fromJson(
            {
                "type": "struct",
                "fields": _full_schema_json(table_dir, v),
            }
        )

    def reader(self, schema):
        return TxlogTableBatchReader(
            schema,
            self.options,
            pinned_head=getattr(self, "_pinned_head", None),
        )


def register(spark) -> None:
    spark.dataSource.register(TxlogChangesDataSource)
    spark.dataSource.register(TxlogTableDataSource)
