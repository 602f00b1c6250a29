"""Model-based test of the transaction log: hypothesis drives random
op sequences (append / add-column-evolving append / DV-delete /
predicate delete / UPDATE / merge-upsert / overwrite / metadata
ADD COLUMN / compact / small-file optimize / restore) against an
in-memory reference model — the composition coverage no hand-written
scenario list reaches, including restores ACROSS an evolution (schema
narrows back), merges under the widened schema, overwrites replacing
an evolved table, and a dropped-by-restore metadata column re-added
later (fresh physical name). After every op the snapshot must equal
the model multiset; at the end, every historical version must still
time-travel to its recorded state and the change-feed fold must net
to the final state."""

from __future__ import annotations

import os
from collections import Counter

import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from etl_sentinel_imagery_spark.operators.txlog import (
    append,
    compact,
    current_version,
    delete_rows_dv,
    delete_where,
    init_table,
    merge_upsert,
    optimize_small_files,
    restore,
    snapshot,
    table_changes,
    update_rows,
    vacuum,
)

# an op is a (kind, seed) pair; seeds make every generated batch
# deterministic and distinct
OP = st.one_of(
    st.tuples(st.just("append"), st.integers(0, 10**6)),
    st.tuples(st.just("append_wide"), st.integers(0, 10**6)),
    st.tuples(st.just("delete"), st.integers(0, 10**6)),
    st.tuples(st.just("delete_where"), st.integers(0, 10**6)),
    st.tuples(st.just("update"), st.integers(0, 10**6)),
    st.tuples(st.just("merge"), st.integers(0, 10**6)),
    st.tuples(st.just("compact"), st.just(0)),
    st.tuples(st.just("optimize_small"), st.just(0)),
    st.tuples(st.just("restore"), st.integers(0, 10**6)),
    # metadata-only ops composed into every sequence position: a
    # stats backfill (content-neutral entry repoint) and a property
    # write must never perturb rows, time travel, or the CDF fold
    st.tuples(st.just("analyze"), st.just(0)),
    st.tuples(st.just("set_props"), st.integers(0, 10**6)),
    # round-8 verbs: INSERT OVERWRITE (one-commit replace under the
    # exact current schema) and pure-metadata ADD COLUMN (NULL-filled
    # reads; restore may drop it, a later add re-mints it)
    st.tuples(st.just("overwrite"), st.integers(0, 10**6)),
    st.tuples(st.just("add_column"), st.just(0)),
    # round-9 verbs: metadata-only TRUNCATE (all files retire from
    # manifest paths — time travel and the CDF fold must survive an
    # empty state mid-sequence) and composite-key merge (tuple
    # matching over (doc_id, val) — val doubles as the second key)
    st.tuples(st.just("truncate"), st.just(0)),
    st.tuples(st.just("merge_composite"), st.integers(0, 10**6)),
    # round-10 verb: REORG APPLY (PURGE) — DV materialization is
    # content-neutral; rows, time travel, and the CDF fold must
    # survive it at any sequence position
    st.tuples(st.just("reorg"), st.just(0)),
    # round-10 fourth wave: incremental clustering (content-neutral
    # rewrite stamping spec markers) and COPY INTO (ledger-idempotent
    # ingest — re-drawing a seed must no-op even across truncate and
    # restore, because the ledger is monotone by design)
    st.tuples(st.just("cluster"), st.just(0)),
    st.tuples(st.just("copy"), st.integers(0, 5)),
)


def _rows_for(seed: int, n: int, tag: str):
    base = (seed * 2654435761) % (2**31)
    return [
        ((base + i) % 37, f"{tag}-{seed}-{i}") for i in range(n)
    ]


def _snapshot_counter(spark, t, version=None) -> Counter:
    """Rows as 3-tuples (doc_id, val, w) — w padded None while the
    table is still narrow, so evolution and restore compare uniformly."""
    df = snapshot(spark, t, version=version)
    rows = df.collect()
    if "w" in df.columns:
        return Counter((r["doc_id"], r["val"], r["w"]) for r in rows)
    return Counter((r["doc_id"], r["val"], None) for r in rows)


def _drive_model(spark, tmp_path_factory, ops):
    t = str(tmp_path_factory.mktemp("txmodel") / "t")
    copy_root = str(tmp_path_factory.mktemp("txmodel_land"))
    copied: set[int] = set()
    df0 = spark.createDataFrame(
        _rows_for(0, 8, "init"), ["doc_id", "val"]
    )
    init_table(spark, t, df0)
    model: Counter = Counter(
        (k, v, None) for k, v in _rows_for(0, 8, "init")
    )
    states = {0: model.copy()}

    for kind, seed in ops:
        if kind == "append":
            rows = _rows_for(seed, 4, "a")
            append(
                spark,
                t,
                spark.createDataFrame(rows, ["doc_id", "val"]),
            )
            model.update((k, v, None) for k, v in rows)
        elif kind == "append_wide":
            # add-column evolution mid-sequence: earlier rows NULL-fill
            rows = [
                (k, v, f"w{seed}") for k, v in _rows_for(seed, 3, "aw")
            ]
            append(
                spark,
                t,
                spark.createDataFrame(rows, ["doc_id", "val", "w"]),
            )
            model.update(rows)
        elif kind == "delete":
            keys = [seed % 37, (seed // 7) % 37]
            delete_rows_dv(spark, t, "doc_id", keys)
            model = Counter(
                {
                    rv: c
                    for rv, c in model.items()
                    if rv[0] not in keys
                }
            )
        elif kind == "merge":
            # key-unique source: 3 distinct keys, replace-or-insert
            # (narrow source — after an evolution this is a narrow
            # write under the wide schema, w NULL-fills)
            ks = sorted({seed % 37, (seed // 5) % 37, (seed // 11) % 37})
            rows = [(k, f"m-{seed}-{k}") for k in ks]
            merge_upsert(
                spark,
                t,
                spark.createDataFrame(rows, ["doc_id", "val"]),
                "doc_id",
            )
            model = Counter(
                {rv: c for rv, c in model.items() if rv[0] not in ks}
            )
            model.update((k, v, None) for k, v in rows)
        elif kind == "delete_where":
            m = 3 + seed % 4
            r = seed % m
            delete_where(spark, t, f"doc_id % {m} = {r}")
            model = Counter(
                {
                    rv: c
                    for rv, c in model.items()
                    if rv[0] % m != r
                }
            )
        elif kind == "update":
            k = seed % 37
            update_rows(
                spark, t, f"doc_id = {k}", {"val": F.lit(f"u-{seed}")}
            )
            # updates preserve every other column (incl. an evolved w)
            updated = Counter()
            for (d, v_, w), c in model.items():
                key = (d, f"u-{seed}", w) if d == k else (d, v_, w)
                updated[key] += c
            model = updated
        elif kind == "compact":
            compact(spark, t, target_files=2)
        elif kind == "optimize_small":
            optimize_small_files(spark, t, small_bytes=10**9)
        elif kind == "analyze":
            from etl_sentinel_imagery_spark.operators.txlog import (
                analyze_table,
            )

            analyze_table(spark, t, ["doc_id"])
        elif kind == "set_props":
            from etl_sentinel_imagery_spark.operators.txlog import (
                set_properties,
            )

            set_properties(t, {f"k{seed % 3}": seed})
        elif kind == "overwrite":
            from etl_sentinel_imagery_spark.operators.txlog import (
                overwrite_table,
            )

            cols = snapshot(spark, t).columns
            rows = _rows_for(seed, 5, "o")
            data = []
            for k, v_ in rows:
                row = {"doc_id": k, "val": v_}
                if "w" in cols:
                    row["w"] = f"ow{seed}"
                if "z" in cols:
                    row["z"] = seed
                data.append(tuple(row[c] for c in cols))
            overwrite_table(
                spark, t, spark.createDataFrame(data, list(cols))
            )
            model = Counter(
                (k, v_, f"ow{seed}" if "w" in cols else None)
                for k, v_ in rows
            )
        elif kind == "add_column":
            from etl_sentinel_imagery_spark.operators.txlog import (
                add_column,
            )

            # metadata-only: NULL-filled, invisible to the model's
            # (doc_id, val, w) view; a restore may drop it and a later
            # add re-mints it under a fresh physical name
            if "z" not in snapshot(spark, t).columns:
                add_column(t, "z", "bigint")
        elif kind == "truncate":
            from etl_sentinel_imagery_spark.operators.txlog import (
                truncate_table,
            )

            truncate_table(t)
            model = Counter()
        elif kind == "merge_composite":
            # composite key (doc_id, val): rows matching BOTH replace
            # (w refreshed), unseen tuples insert — doc_id-only
            # overlaps must NOT match
            pool = sorted(model)[: 2] if model else []
            rows = [
                (d, v_, f"mc{seed}") for (d, v_, _w) in pool
            ] + [(100 + seed % 7, f"mc-{seed}", f"mc{seed}")]
            src = {(d, v_) for d, v_, _ in rows}
            if len(src) != len(rows):
                rows = rows[-1:]
                src = {(rows[0][0], rows[0][1])}
            merge_upsert(
                spark,
                t,
                spark.createDataFrame(rows, ["doc_id", "val", "w"]),
                ["doc_id", "val"],
            )
            model = Counter(
                {
                    rv: c
                    for rv, c in model.items()
                    if (rv[0], rv[1]) not in src
                }
            )
            model.update(rows)
        elif kind == "reorg":
            optimize_small_files(spark, t, small_bytes=0)
        elif kind == "cluster":
            from etl_sentinel_imagery_spark.operators.txlog import (
                cluster_table,
            )

            cluster_table(
                spark, t, cols=["doc_id"], target_bytes=10**9
            )
        elif kind == "copy":
            from etl_sentinel_imagery_spark.operators.txlog import (
                copy_into,
            )

            srcd = os.path.join(copy_root, f"land{seed}")
            if seed not in copied:
                os.makedirs(srcd, exist_ok=True)
                rows = _rows_for(seed, 3, "cp")
                pq.write_table(
                    pa.table(
                        {
                            "doc_id": pa.array(
                                [k for k, _ in rows], pa.int64()
                            ),
                            "val": pa.array(
                                [v_ for _, v_ in rows], pa.string()
                            ),
                        }
                    ),
                    os.path.join(srcd, "f.parquet"),
                )
            _, stats = copy_into(spark, t, srcd)
            if seed in copied:
                assert stats["files_loaded"] == 0, (
                    "ledger failed to dedup a replayed COPY"
                )
            else:
                assert stats["files_loaded"] == 1
                model.update(
                    (k, v_, None) for k, v_ in _rows_for(seed, 3, "cp")
                )
                copied.add(seed)
        elif kind == "restore":
            target = sorted(states)[seed % len(states)]
            restore(spark, t, target)
            model = states[target].copy()
        v = current_version(t)
        states[v] = model.copy()
        assert _snapshot_counter(spark, t) == model, (
            f"divergence after {kind}(seed={seed}) at v{v}"
        )

    # every recorded version still time-travels to its state
    for v, state in states.items():
        got = _snapshot_counter(spark, t, version=v)
        assert got == state, f"time travel to v{v} diverged"

    # the change feed nets to the final state (compactions skipped as
    # content-neutral; restores and DV commits diff entry state)
    feed = table_changes(spark, t, -1)
    sign = F.when(F.col("_change_type") == "insert", 1).otherwise(-1)
    gcols = ["doc_id", "val"] + (["w"] if "w" in feed.columns else [])
    net = Counter()
    for r in (
        feed.groupBy(*gcols).agg(F.sum(sign).alias("n")).collect()
    ):
        if r["n"]:
            net[(r["doc_id"], r["val"], r["w"] if "w" in gcols else None)] = r["n"]
    assert net == model, "CDF fold diverged from the final state"

    # vacuum never breaks the current snapshot
    vacuum(t, min_age_seconds=0)
    assert _snapshot_counter(spark, t) == model


@settings(max_examples=8, deadline=None)
@given(st.lists(OP, min_size=1, max_size=7))
def test_random_op_sequences_match_reference_model(
    spark, tmp_path_factory, ops
):
    _drive_model(spark, tmp_path_factory, ops)


@settings(max_examples=5, deadline=None)
@given(st.lists(OP, min_size=1, max_size=7))
def test_model_on_simulated_object_store(
    spark, tmp_path_factory, ops
):
    """Round-10 verdict #2: the SAME model sequences under OBJECT-
    STORE semantics end to end — commits arbitrated by the CAS-backed
    MemoryLogStore (no atomic link/replace) AND every driver-side
    file operation through SimulatedObjectStoreFS (no rename: publish
    is copy+delete; listings lag two calls behind writes). Rows, time
    travel, the CDF fold, ledger idempotence and vacuum safety must
    all hold — correctness never depends on rename atomicity or
    listing consistency."""
    from etl_sentinel_imagery_spark.operators import txlog as tx

    store, fs = tx._LOG_STORE, tx._TABLE_FS
    tx.set_log_store(tx.MemoryLogStore())
    tx.set_table_fs(tx.SimulatedObjectStoreFS(list_lag=2))
    try:
        _drive_model(spark, tmp_path_factory, ops)
    finally:
        tx.set_log_store(store)
        tx.set_table_fs(fs)
