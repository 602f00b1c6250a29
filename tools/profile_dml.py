"""Per-stage attribution for the txlog write path (round-13 item #2).

Monkeypatch-times the internals the DML battery routes through
(_write_dv_sidecar, _move_in_data_files, _read_entries consumers,
DataFrame.localCheckpoint, commit IO) while replaying the battery's
statement sequence at $SPARK_GRAFT_SF_DIR, then times each of the five
final aggregates separately. Pure measurement — no behavior change.

Usage: python tools/profile_dml.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame

from etl_sentinel_imagery_spark.session import get_spark
from etl_sentinel_imagery_spark.operators import txlog

ACC: dict[str, list[float]] = defaultdict(list)
STACK: list[str] = []


def wrap(mod, name):
    orig = getattr(mod, name)

    def timed(*a, **k):
        STACK.append(name)
        t0 = time.time()
        try:
            out = orig(*a, **k)
            if name == "_move_in_data_files" and isinstance(out, list):
                rows = sum(e.get("rows", 0) for e in out)
                print(f"    [move_in] {len(out)} files, {rows} rows")
            return out
        finally:
            STACK.pop()
            ACC[name].append(time.time() - t0)

    setattr(mod, name, timed)
    return orig


def wrap_method(cls, name):
    orig = getattr(cls, name)

    def timed(self, *a, **k):
        t0 = time.time()
        try:
            return orig(self, *a, **k)
        finally:
            owner = STACK[-1] if STACK else "top"
            ACC[f"{name}@{owner}"].append(time.time() - t0)

    setattr(cls, name, timed)
    return orig


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("profile-dml", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")

    for fname in (
        "_write_dv_sidecar",
        "_move_in_data_files",
        "_read_entries",
        "_probe_candidates",
        "_commit_delta",
        "_enforce_constraints",
        "_try_commit_merge",
        "_try_commit_dv",
        "_merge_once",
        "table_changes",
        "snapshot",
    ):
        wrap(txlog, fname)
    wrap_method(DataFrame, "localCheckpoint")
    wrap_method(DataFrame, "collect")

    from etl_sentinel_imagery_spark.queries.dml_q import _txlog_dml_battery

    legs: dict[str, float] = {}
    t0 = time.time()
    out = _txlog_dml_battery(spark, sf_dir, leg_timings=legs)
    n = out.count()
    total = time.time() - t0
    legs["final_aggregates"] = round(total - sum(legs.values()), 3)

    print(f"\n== battery total {total:.3f}s  rows={n}")
    for k, v in legs.items():
        print(f"  leg {k:20s} {v:8.3f}")
    print("\n== internal attribution (n calls, total s, max s)")
    for k in sorted(ACC, key=lambda k: -sum(ACC[k])):
        v = ACC[k]
        print(f"  {k:36s} n={len(v):3d} total={sum(v):8.3f} max={max(v):7.3f}")


if __name__ == "__main__":
    main()
