"""Model-based test of the streaming CDF sinks: hypothesis drives
random interleavings of upstream commits (append / DV delete / merge),
consumption steps, and CRASH events (the cursor rewinds to an earlier
consumed point — exactly the crash-between-process-and-advance shape,
including the partial-overlap retry the round-5 ADVICE found a
duplicate-delivery bug in). All three sink disciplines run side by
side off independent cursors over one upstream, and after a final
drain each must hold its own exactly-once invariant:

- ``cdf_append_sink``: the destination holds EXACTLY ONE copy of the
  upstream's full change feed (additive folds depend on it);
- ``cdf_replicate_sink``: the destination is row-identical to the
  upstream snapshot;
- ``cdf_upsert_sink``: every key LIVE upstream appears at exactly its
  upstream value (the range holding its last insert nets it as the
  winner); a key deleted upstream may appear at a previously-inserted
  value or not at all — net-state application is RANGE-granular, so a
  key inserted and deleted inside one consumed range never lands
  (inherent to any per-batch netting; documented on the sink).
"""

from __future__ import annotations

import json
import os
from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from etl_sentinel_imagery_spark.operators.txlog import (
    append,
    delete_rows_dv,
    init_table,
    merge_upsert,
    snapshot,
    table_changes,
)
from etl_sentinel_imagery_spark.streaming.cdf_source import (
    CdfCursor,
    cdf_append_sink,
    cdf_replicate_sink,
    cdf_step,
    cdf_upsert_sink,
    drain_table_changes,
)

OP = st.one_of(
    st.tuples(st.just("append"), st.integers(0, 10**6)),
    st.tuples(st.just("delete"), st.integers(0, 10**6)),
    st.tuples(st.just("merge"), st.integers(0, 10**6)),
    st.tuples(st.just("step"), st.just(0)),
    # crash on one of the three sinks: deliver, then lose the cursor
    # advance (rewind to a previously-consumed version)
    st.tuples(st.just("crash"), st.integers(0, 2)),
)


def _rows_for(seed: int, n: int, tag: str):
    base = (seed * 2654435761) % (2**31)
    return [((base + i) % 29, f"{tag}-{seed}-{i}") for i in range(n)]


def _rewind(ckpt: str, to_version: int) -> None:
    cur = CdfCursor(ckpt)
    with open(cur._path, "w") as f:
        json.dump({"version": to_version}, f)


@settings(max_examples=5, deadline=None)
@given(st.lists(OP, min_size=2, max_size=8))
def test_sink_disciplines_hold_under_crash_interleavings(
    spark, tmp_path_factory, ops
):
    root = tmp_path_factory.mktemp("cdfmodel")
    src = str(root / "src")
    dsts = [str(root / d) for d in ("d_append", "d_repl", "d_upsert")]
    ckpts = [str(root / c) for c in ("c_append", "c_repl", "c_upsert")]
    sinks = [
        cdf_append_sink(dsts[0], app_id="m-append"),
        cdf_replicate_sink(dsts[1], "doc_id", app_id="m-repl"),
        cdf_upsert_sink(dsts[2], "doc_id", app_id="m-upsert"),
    ]
    init0 = _rows_for(0, 6, "init")
    # merge/upsert semantics need a key-unique upstream: dedupe seeds
    seen = {k for k, _ in init0}
    init_table(
        spark, src, spark.createDataFrame(init0, ["doc_id", "val"])
    )
    consumed: list[list[int]] = [[-1], [-1], [-1]]  # cursor history

    def step_all():
        for i in range(3):
            r = cdf_step(spark, src, ckpts[i], sinks[i])
            if r is not None:
                consumed[i].append(r[1])

    for kind, seed in ops:
        if kind == "append":
            rows = [
                (k, v)
                for k, v in _rows_for(seed, 3, "a")
                if k not in seen
            ]
            if not rows:
                continue
            seen.update(k for k, _ in rows)
            append(
                spark,
                src,
                spark.createDataFrame(rows, ["doc_id", "val"]),
            )
        elif kind == "delete":
            delete_rows_dv(
                spark, src, "doc_id", [seed % 29, (seed // 7) % 29]
            )
        elif kind == "merge":
            ks = sorted({seed % 29, (seed // 5) % 29})
            seen.update(ks)
            merge_upsert(
                spark,
                src,
                spark.createDataFrame(
                    [(k, f"m-{seed}-{k}") for k in ks],
                    ["doc_id", "val"],
                ),
                "doc_id",
            )
        elif kind == "step":
            step_all()
        elif kind == "crash":
            i = seed % 3
            # deliver a batch, then 'lose' the cursor write: rewind to
            # a random earlier consumed point
            r = cdf_step(spark, src, ckpts[i], sinks[i])
            if r is not None:
                consumed[i].append(r[1])
            hist = consumed[i]
            _rewind(ckpts[i], hist[len(hist) // 2])

    for i in range(3):
        drain_table_changes(spark, src, ckpts[i], sinks[i])

    # --- append sink: exactly one copy of the full feed ---
    feed = table_changes(spark, src, -1)
    want_feed = Counter(
        (r["doc_id"], r["val"], r["_change_type"], r["_commit_version"])
        for r in feed.collect()
    )
    got_feed = Counter(
        (r["doc_id"], r["val"], r["_change_type"], r["_commit_version"])
        for r in snapshot(spark, dsts[0]).collect()
    )
    assert got_feed == want_feed, "append sink lost exactly-once"

    # --- replicate sink: row-identical mirror ---
    want_rows = sorted(
        (r["doc_id"], r["val"]) for r in snapshot(spark, src).collect()
    )
    got_rows = sorted(
        (r["doc_id"], r["val"])
        for r in snapshot(spark, dsts[1]).collect()
    )
    assert got_rows == want_rows, "replicate sink diverged"

    # --- upsert sink: live keys exact; dead keys only ever hold a
    # historically-inserted value (range-granular netting means a key
    # inserted+deleted within one consumed range may never land) ---
    inserted: dict = {}
    for r in feed.collect():
        if r["_change_type"] == "insert":
            inserted.setdefault(r["doc_id"], set()).add(r["val"])
    live = dict(want_rows)
    got_up = {
        r["doc_id"]: r["val"]
        for r in snapshot(spark, dsts[2]).collect()
    }
    for k, v in live.items():
        assert got_up.get(k) == v, f"live key {k} diverged in upsert"
    for k, v in got_up.items():
        if k not in live:
            assert v in inserted.get(k, set()), (
                f"dead key {k} holds a never-inserted value {v!r}"
            )
