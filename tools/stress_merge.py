"""Scale-path stress: MERGE INTO at 1M rows, with and without the
manifest-stats probe pruning.

Builds a 1M-row txlog table with stats on the key, ZORDERs it so each
file covers a narrow key range, then merges a source whose keys live
in ONE narrow range: the pruned probe must touch a small fraction of
the files (files-touched is the scale metric — at toy file sizes the
walls are fixed-cost-dominated and ~equal), with identical results to
a forced full probe. Also measures insert-only and scattered-key
merges (pruning can't help the latter; the distributed semi-join is
the cost).

Usage: python tools/stress_merge.py [n_rows] [n_files]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import shutil
import tempfile

from pyspark.sql import functions as F

from etl_sentinel_imagery_spark.operators.txlog import (
    _entry_name,
    _stats_probe_subset,
    current_version,
    init_table,
    merge_upsert,
    optimize,
    resolve_files,
    restore,
    snapshot,
)
from etl_sentinel_imagery_spark.session import get_spark


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g")
    spark = get_spark(
        "stress_merge", extra_conf={"spark.driver.memory": mem}
    )
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="stress_merge_")
    t = os.path.join(root, "t")

    df = spark.range(n).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 97).cast("int").alias("grp"),
        F.concat(F.lit("v-"), F.col("id")).alias("body"),
    )
    t0 = time.time()
    init_table(spark, t, df.repartition(n_files), stat_cols=["doc_id"])
    optimize(spark, t, zorder_by=["doc_id"], target_files=n_files)
    print(f"build+zorder {n} rows / {n_files} files: {time.time()-t0:.1f}s")

    # UPDATE-ONLY narrow source: 10k contiguous keys, a ~1% slice —
    # the case stats pruning exists for. (A source that ALSO inserts
    # brand-new high keys stretches [lo, hi] past the table max and
    # admits every file above lo — measured on a first cut of this
    # tool: half the files admitted. Split insert-heavy merges, or
    # pass explicit candidates, when the source mixes ranges.)
    lo = n // 2
    src_narrow = spark.range(lo, lo + 10_000).select(
        F.col("id").alias("doc_id"),
        F.lit(-1).cast("int").alias("grp"),
        F.concat(F.lit("upd-"), F.col("id")).alias("body"),
    )
    entries = resolve_files(t)
    probe = _stats_probe_subset(entries, "doc_id", lo, lo + 9_999)
    print(
        f"narrow update merge probe: {len(probe)}/{len(entries)} "
        f"files admitted by stats"
    )
    assert len(probe) <= max(3, len(entries) // 16), "pruning failed"
    v_before = current_version(t)
    t0 = time.time()
    merge_upsert(spark, t, src_narrow, "doc_id")
    pruned_wall = time.time() - t0
    snap = snapshot(spark, t)
    assert snap.count() == n
    assert snap.filter("grp = -1").count() == 10_000
    print(f"narrow update merge (stats-pruned probe): {pruned_wall:.1f}s")

    # forced full probe on the SAME state (restore first): at this toy
    # scale fixed costs dominate and walls are ~equal — the
    # scale-relevant metric is FILES TOUCHED above (data read at real
    # file sizes), not seconds here
    restore(spark, t, v_before)
    all_names = [_entry_name(e) for e in resolve_files(t)]
    t0 = time.time()
    merge_upsert(
        spark, t, src_narrow, "doc_id", candidate_names=all_names
    )
    full_wall = time.time() - t0
    assert snapshot(spark, t).count() == n
    print(f"narrow update merge (forced full probe): {full_wall:.1f}s")

    # insert-heavy merge: new keys beyond the table max
    t0 = time.time()
    merge_upsert(
        spark,
        t,
        spark.range(n, n + 1_000).select(
            F.col("id").alias("doc_id"),
            F.lit(-2).cast("int").alias("grp"),
            F.concat(F.lit("new-"), F.col("id")).alias("body"),
        ),
        "doc_id",
    )
    print(f"insert-only merge (1k new keys): {time.time()-t0:.1f}s")
    assert snapshot(spark, t).count() == n + 1_000

    # scattered keys: every 97th row — pruning admits ~everything,
    # the semi-join carries the cost
    src_wide = (
        snapshot(spark, t)
        .filter("doc_id % 9973 = 0")
        .select(
            "doc_id",
            F.lit(-3).cast("int").alias("grp"),
            F.lit("wide").alias("body"),
        )
    )
    t0 = time.time()
    merge_upsert(spark, t, src_wide, "doc_id")
    print(f"scattered merge ({src_wide.count()} keys): {time.time()-t0:.1f}s")
    assert snapshot(spark, t).filter("grp = -3").count() == src_wide.count()

    # ---- Bloom-composed probe on a NON-stats key (round 6) ----
    # A stat-less table clustered by the key (range partitioning, no
    # manifest stats recorded) + a per-file Bloom sidecar: the merge's
    # DataFrame-keyed Bloom probe (dv_delete_candidates_df inside
    # _probe_candidates) shrinks the match scan to the files that can
    # hold source keys — "ZORDER pruning without stats".
    #
    # SIZING MATH (learned here the hard way — the first cut probed
    # 10k keys against default 32 Kbit filters and admitted 64/64
    # files): a file is falsely admitted with prob 1-(1-p)^|keys|
    # where p is the per-key FP rate, so candidate pruning needs
    # p << 1/|keys|. At 1M rows / 64 files each filter holds ~15.6k
    # keys: the 32 Kbit default is SATURATED (p≈0.53 — useless even
    # for one key); 1 Mbit/file (128 KB, ~67 bits/key, p≈2e-7) keeps
    # a 1000-key GDPR batch's false-admit odds per file at ~2e-4.
    # Bloom probes are for point-scale key sets; range-shaped bulk
    # sources are what manifest stats + ZORDER answer.
    from etl_sentinel_imagery_spark.operators.skipping import (
        build_file_bloom_index,
    )
    from etl_sentinel_imagery_spark.operators.txlog import (
        dv_delete_candidates_df,
    )

    t2 = os.path.join(root, "t2")
    t0 = time.time()
    init_table(
        spark,
        t2,
        df.repartitionByRange(n_files, "doc_id"),  # clustered, NO stats
    )
    build_file_bloom_index(spark, t2, "doc_id", n_bits=1 << 20)
    print(f"stat-less clustered table + bloom index: {time.time()-t0:.1f}s")
    src_gdpr = spark.range(lo, lo + 1_000).select(
        F.col("id").alias("doc_id"),
        F.lit(-4).cast("int").alias("grp"),
        F.concat(F.lit("gdpr-"), F.col("id")).alias("body"),
    )
    n_live = len(resolve_files(t2))
    t0 = time.time()
    cand = dv_delete_candidates_df(
        spark, t2, "doc_id", src_gdpr.select("doc_id")
    )
    print(
        f"bloom candidates for 1k contiguous keys: "
        f"{len(cand)}/{n_live} files ({time.time()-t0:.1f}s probe)"
    )
    assert len(cand) <= max(4, n_live // 8), "bloom pruning failed"
    t0 = time.time()
    merge_upsert(spark, t2, src_gdpr, "doc_id")
    bloom_wall = time.time() - t0
    snap2 = snapshot(spark, t2)
    assert snap2.count() == n
    assert snap2.filter("grp = -4").count() == 1_000
    print(f"1k-key update merge (bloom-pruned, stat-less): {bloom_wall:.1f}s")

    shutil.rmtree(root, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
