"""Key-free replication via row ids: `apply_row_changes` /
`rowid_replicate_sink` mirror a source table that has NO natural key
— duplicate rows included — which the key-unique `apply_changes` /
`cdf_replicate_sink` pair cannot bind to at all. Row ids are unique
by construction, so the upsert invariant holds for any content."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_sentinel_imagery_spark.operators.txlog import (
    append,
    apply_row_changes,
    compact,
    current_version,
    delete_where,
    enable_row_tracking,
    init_table,
    restore,
    snapshot,
    update_rows,
)
from etl_sentinel_imagery_spark.streaming.cdf_source import (
    drain_table_changes,
    rowid_replicate_sink,
)


def _dups(spark, n, tag, n_dup=3):
    """n rows plus n_dup EXACT duplicates of the first row — no
    column (or combination) is a key."""
    base = spark.range(n).select(
        (F.col("id") % 7).cast("int").alias("grp"),
        F.concat(F.lit(tag), (F.col("id") % 11)).alias("body"),
    )
    first = base.limit(1)
    out = base
    for _ in range(n_dup):
        out = out.unionAll(first)
    return out


def _content(spark, t):
    from collections import Counter

    return Counter(
        (r["grp"], r["body"])
        for r in snapshot(spark, t).select("grp", "body").collect()
    )


def test_batch_apply_row_changes_mirrors_dup_table(spark, tmp_path):
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    init_table(spark, src, _dups(spark, 30, "a-").repartition(2))
    enable_row_tracking(src)
    init_table(spark, dst, stat_cols=["_src_row_id"])
    v0 = apply_row_changes(spark, src, dst, -1)
    assert _content(spark, dst) == _content(spark, src)

    # mutate without any key: predicate update + delete + dup append
    update_rows(spark, src, "grp = 3", {"body": F.lit("upd")})
    delete_where(spark, src, "grp = 5")
    append(spark, src, _dups(spark, 10, "b-"))
    from_v = 1  # src version the first apply covered (init+enable)
    apply_row_changes(spark, src, dst, from_v)
    assert _content(spark, dst) == _content(spark, src)
    # provenance ids stay unique in the mirror
    n = snapshot(spark, dst).count()
    assert (
        snapshot(spark, dst).select("_src_row_id").distinct().count()
        == n
    )
    assert current_version(dst) == v0 + 1  # one commit per range


def test_streaming_rowid_sink_exactly_once_with_rewrites(
    spark, tmp_path
):
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    ckpt = str(tmp_path / "ckpt")
    init_table(spark, src, _dups(spark, 30, "a-").repartition(2))
    enable_row_tracking(src)
    sink = rowid_replicate_sink(src, dst)

    drain_table_changes(spark, src, ckpt, sink)
    assert _content(spark, dst) == _content(spark, src)

    update_rows(spark, src, "grp = 2", {"body": F.lit("u1")})
    compact(spark, src, target_files=1)  # rewrite inside the range
    append(spark, src, _dups(spark, 8, "c-", n_dup=2))
    v_keep = current_version(src)
    delete_where(spark, src, "grp = 0")
    drain_table_changes(spark, src, ckpt, sink)
    assert _content(spark, dst) == _content(spark, src)

    restore(spark, src, v_keep)  # un-delete via restore
    drain_table_changes(spark, src, ckpt, sink)
    assert _content(spark, dst) == _content(spark, src)

    # replay is a no-op (exactly once)
    n_dst_v = current_version(dst)
    drain_table_changes(spark, src, str(tmp_path / "ckpt"), sink)
    assert current_version(dst) == n_dst_v
    # the duplicates genuinely survived end-to-end
    assert max(_content(spark, dst).values()) >= 3
