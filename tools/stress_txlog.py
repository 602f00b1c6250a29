"""Metadata-scaling stress for the transaction log: commit/read labels
at large manifest sizes WITHOUT creating real data files (the log
never opens data files for a commit — only the manifest JSON moves).

Measures, at n synthetic file entries (with per-file stats — the fat
case): manifest commit wall, pointer-resolved read wall, file_diff
wall, and manifest bytes. Evidence for the docstring's claim that 1M
files is control-plane-sized driver work.

Usage: python tools/stress_txlog.py [n_files]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_sentinel_imagery_spark.operators.txlog import (
    _commit,
    _commit_delta,
    _log_dir,
    _manifest_path,
    file_diff,
    read_manifest,
    resolve_files,
)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    tmp = tempfile.mkdtemp(prefix="stress_txlog_")
    os.makedirs(_log_dir(tmp), exist_ok=True)
    entries = [
        {
            "name": f"part-{i:08d}.parquet",
            "stats": {"doc_id": [i * 1000, (i + 1) * 1000 - 1]},
        }
        for i in range(n)
    ]
    # seed v0 by hand (init_table wants a SparkSession for data moves)
    # — through the same payload helper the real init uses, so v0 is
    # parts-backed at this scale exactly like a production table
    from etl_sentinel_imagery_spark.operators.txlog import (
        _files_payload_from_full,
    )

    with open(_manifest_path(tmp, 0), "w") as f:
        json.dump(
            {"version": 0, "parent": None, "op": "init",
             "stat_cols": ["doc_id"],
             **_files_payload_from_full(tmp, entries)},
            f,
        )
    with open(os.path.join(_log_dir(tmp), "_CURRENT"), "w") as f:
        f.write("0")

    t0 = time.time()
    v1 = _commit(
        tmp, 0, entries + [{"name": "part-new.parquet", "stats": {}}],
        "append", ["doc_id"],
    )
    commit_s = time.time() - t0
    # the delta path: commit cost is proportional to the CHANGE
    t0 = time.time()
    v2 = _commit_delta(
        tmp, v1, [{"name": "part-new2.parquet", "stats": {}}], [],
        "append", ["doc_id"],
    )
    delta_commit_s = time.time() - t0
    t0 = time.time()
    n_resolved = len(resolve_files(tmp, v2))
    resolve_s = time.time() - t0
    t0 = time.time()
    m = read_manifest(tmp, v1)
    read_s = time.time() - t0
    t0 = time.time()
    added, removed = file_diff(tmp, 0, v1)
    diff_s = time.time() - t0
    size_mb = os.path.getsize(_manifest_path(tmp, v1)) / 1e6
    # the parts-checkpoint REUSE path: drive the version counter to a
    # checkpoint boundary with ~1000 files of churn and measure the
    # checkpoint commit — the steady-state cost at 1M files, which the
    # inline-JSON format paid O(table) for (~10 s measured)
    from etl_sentinel_imagery_spark.operators import txlog as _tx

    v = v2
    churn = 0
    while (v + 1) % _tx.CHECKPOINT_EVERY != 0:
        v = _commit_delta(
            tmp, v,
            [{"name": f"churn-{churn:06d}.parquet",
              "stats": {"doc_id": [0, 1]}}],
            [], "append", ["doc_id"],
        )
        churn += 1
    t0 = time.time()
    v = _commit_delta(
        tmp, v,
        [{"name": "churn-final.parquet", "stats": {"doc_id": [0, 1]}}],
        [f"part-{i:08d}.parquet" for i in range(500)],
        "append", ["doc_id"],
    )
    ckpt_commit_s = time.time() - t0
    ckpt_mb = os.path.getsize(_manifest_path(tmp, v)) / 1e6
    t0 = time.time()
    n_at_ckpt = len(resolve_files(tmp, v))
    resolve_ckpt_s = time.time() - t0
    parts_dir = os.path.join(_log_dir(tmp), "parts")
    parts_mb = (
        sum(
            os.path.getsize(os.path.join(parts_dir, f))
            for f in os.listdir(parts_dir)
        )
        / 1e6
        if os.path.isdir(parts_dir)
        else 0.0
    )
    print(
        json.dumps(
            {
                "n_files": n,
                "manifest_mb": round(size_mb, 1),
                "parts_total_mb": round(parts_mb, 1),
                "full_commit_s": round(commit_s, 2),
                "delta_commit_s": round(delta_commit_s, 4),
                "ckpt_commit_s": round(ckpt_commit_s, 4),
                "ckpt_manifest_mb": round(ckpt_mb, 3),
                "ckpt_churn": churn + 501,
                "resolve_s": round(resolve_s, 2),
                "resolve_ckpt_s": round(resolve_ckpt_s, 2),
                "n_resolved": n_resolved,
                "n_at_ckpt": n_at_ckpt,
                "read_s": round(read_s, 2),
                "diff_s": round(diff_s, 2),
                "added": len(added),
                "removed": len(removed),
            }
        )
    )
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
