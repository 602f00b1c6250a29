"""Distributed prefix sum + sequence packing: equality with the
single-window formulation, partitioning invariance, and tiling
invariants of the packed slices."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from etl_sentinel_imagery_spark.operators.packing import (
    pack_sequence_slices,
    with_global_offset,
)
from etl_sentinel_imagery_spark.sources.tables import load_table
from tests.conftest import SF_DIR

SEQ_LEN = 256


def test_global_offset_matches_single_window(spark):
    """Two-phase prefix sum == the (single-task) global window sum."""
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "n_chars")
    got = {
        r["doc_id"]: r["offset"]
        for r in with_global_offset(docs, "doc_id", "n_chars").collect()
    }
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
    want = {
        r["doc_id"]: r["off"]
        for r in docs.withColumn(
            "off", F.coalesce(F.sum("n_chars").over(w), F.lit(0))
        ).collect()
    }
    assert got == want


def test_global_offset_partitioning_invariant(spark):
    """The offsets cannot depend on how the input happens to be split."""
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "n_chars")
    a = {
        r["doc_id"]: r["offset"]
        for r in with_global_offset(docs, "doc_id", "n_chars").collect()
    }
    b = {
        r["doc_id"]: r["offset"]
        for r in with_global_offset(
            docs.repartition(7), "doc_id", "n_chars", num_partitions=3
        ).collect()
    }
    assert a == b


def test_pack_slices_tile_exactly(spark):
    """Packing invariants: every document's slices cover it exactly once
    in order; every sequence except the last is filled to SEQ_LEN with
    no gaps or overlaps; slice arithmetic is internally consistent."""
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "n_chars")
    rows = pack_sequence_slices(docs, "doc_id", "n_chars", SEQ_LEN).collect()
    assert rows

    by_doc: dict = {}
    by_seq: dict = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
        by_seq.setdefault(r["seq_idx"], []).append(r)

    n_by_doc = {
        r["doc_id"]: r["n_chars"]
        for r in docs.filter(F.col("n_chars") > 0).collect()
    }
    assert set(by_doc) == set(n_by_doc)
    for doc, slices in by_doc.items():
        slices.sort(key=lambda r: r["seq_idx"])
        assert sum(r["slice_len"] for r in slices) == n_by_doc[doc]
        assert slices[0]["doc_slice_start"] == 0
        pos = 0
        for r in slices:
            assert r["doc_slice_start"] == pos  # contiguous, in order
            pos += r["slice_len"]

    last_seq = max(by_seq)
    for seq, slices in by_seq.items():
        slices.sort(key=lambda r: r["seq_slice_start"])
        pos = 0
        for r in slices:
            assert r["seq_slice_start"] == pos  # no gap, no overlap
            pos += r["slice_len"]
        if seq != last_seq:
            assert pos == SEQ_LEN  # every interior sequence is full


def test_pack_ffd_constraints_and_quality(spark):
    """No bin overflows, every item lands exactly once, and the packing
    is within the FFD guarantee band of the lower bound."""
    from etl_sentinel_imagery_spark.operators.packing import (
        pack_ffd,
        packing_stats,
    )

    lengths = ([900] * 10) + ([600] * 10) + ([300] * 10) + ([100] * 30)
    items = spark.createDataFrame(
        [(i, l) for i, l in enumerate(lengths)], ["doc_id", "n_tokens"]
    )
    out = pack_ffd(items, "doc_id", "n_tokens", seq_len=1000).collect()
    assert len(out) == len(lengths)
    assert {r["doc_id"] for r in out} == set(range(len(lengths)))
    fills = {}
    for r in out:
        fills[r["bin_id"]] = fills.get(r["bin_id"], 0) + r["n_tokens"]
        assert not r["oversize"]
    assert max(fills.values()) <= 1000
    total = sum(lengths)
    lower = -(-total // 1000)  # ceil: information-theoretic bound
    # 11/9·OPT+1 plus one under-full bin per partition of slack
    n_part = spark.sparkContext.defaultParallelism
    assert len(fills) <= (11 * lower) // 9 + 1 + n_part

    st = packing_stats(
        pack_ffd(items, "doc_id", "n_tokens", seq_len=1000), 1000
    )
    assert st["n_items"] == len(lengths)
    assert st["n_bins"] == len(fills)
    assert st["total_tokens"] == total
    assert st["utilization"] > 0.5


def test_pack_ffd_deterministic_and_oversize(spark):
    import pytest as _pytest

    from etl_sentinel_imagery_spark.operators.packing import pack_ffd

    items = spark.createDataFrame(
        [(1, 700), (2, 700), (3, 300), (4, 1500)],
        ["doc_id", "n_tokens"],
    )
    with _pytest.raises(ValueError, match="1500"):
        pack_ffd(items, "doc_id", "n_tokens", seq_len=1000)

    out = {
        r["doc_id"]: r
        for r in pack_ffd(
            items, "doc_id", "n_tokens", seq_len=1000,
            num_partitions=1, allow_oversize=True
        ).collect()
    }
    assert out[4]["oversize"]
    # the oversize bin holds ONLY the oversize item
    assert [r["doc_id"] for r in out.values() if r["bin_id"] == out[4]["bin_id"]] == [4]
    # two 700s cannot share; the 300 joins one of them
    assert out[1]["bin_id"] != out[2]["bin_id"]
    assert out[3]["bin_id"] in (out[1]["bin_id"], out[2]["bin_id"])

    a = sorted(
        map(
            tuple,
            pack_ffd(
                items, "doc_id", "n_tokens", 1000,
                num_partitions=1, allow_oversize=True
            ).collect(),
        )
    )
    b = sorted(
        map(
            tuple,
            pack_ffd(
                items, "doc_id", "n_tokens", 1000,
                num_partitions=1, allow_oversize=True
            ).collect(),
        )
    )
    assert a == b


def test_grouped_offset_matches_grouped_window(spark):
    """with_grouped_offset (round 12) == the naive per-group window,
    for every group, at several partition counts."""
    from etl_sentinel_imagery_spark.operators.packing import (
        with_grouped_offset,
    )

    df = spark.range(500).select(
        F.col("id").alias("k"),
        F.concat(F.lit("g"), (F.col("id") % 7).cast("string")).alias("g"),
        (F.col("id") % 13 + 1).cast("long").alias("v"),
    )
    w = (
        Window.partitionBy("g")
        .orderBy("k")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ref = {
        (r["g"], r["k"]): r["off"]
        for r in df.withColumn(
            "off", F.coalesce(F.sum("v").over(w), F.lit(0))
        ).collect()
    }
    for n in (1, 4, 17):
        got = {
            (r["g"], r["k"]): r["off"]
            for r in with_grouped_offset(
                df.repartition(5), ["g"], "k", "v", "off",
                num_partitions=n,
            ).collect()
        }
        assert got == ref, n


def test_grouped_offset_collect_is_control_plane_sized(spark):
    """The totals collect is ≤ n_partitions + n_groups rows: each
    range partition holds a contiguous (group, order) span, so the
    per-(pid, group) total count stays bounded however the rows are
    distributed upstream."""
    from etl_sentinel_imagery_spark.operators.packing import (
        with_grouped_offset,
    )

    n_parts, n_groups = 8, 5
    df = spark.range(1000).select(
        F.col("id").alias("k"),
        (F.col("id") % n_groups).cast("string").alias("g"),
        F.lit(1).cast("long").alias("v"),
    )
    parted = (
        df.withColumn("_val", F.col("v"))
        .repartitionByRange(n_parts, "g", "k")
        .sortWithinPartitions("g", "k")
        .withColumn("_pid", F.spark_partition_id())
    )
    n_tot = parted.groupBy("_pid", "g").count().count()
    assert n_tot <= n_parts + n_groups
    # and the operator's answer is still right at this shape
    out = with_grouped_offset(df, ["g"], "k", "v", num_partitions=n_parts)
    assert out.filter(F.col("offset") >= 200).count() == 0
    assert out.count() == 1000


def test_stratified_token_budget_one_pass_equals_loop(spark):
    """The one-job stratified_token_budget selects BIT-IDENTICAL rows
    (and cum_before values) to the per-source sample_token_budget
    loop it replaced — the seed scoping md5(seed:src ∥ key) is the
    same string the loop produced."""
    from etl_sentinel_imagery_spark.operators.sampling import (
        sample_token_budget,
        stratified_token_budget,
    )

    df = spark.range(300).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 9 + 1).cast("long").alias("n_tok"),
        F.concat(F.lit("s"), (F.col("id") % 4).cast("string")).alias(
            "source"
        ),
    )
    budgets = {"s0": 50, "s1": 80, "s2": 30}
    got = {
        (r["source"], r["doc_id"]): r["cum_before"]
        for r in stratified_token_budget(
            df, "source", budgets, "n_tok", seed="mix"
        ).collect()
    }
    ref = {}
    for s, b in budgets.items():
        for r in sample_token_budget(
            df.filter(F.col("source") == s), b, "n_tok",
            seed=f"mix:{s}",
        ).collect():
            ref[(s, r["doc_id"])] = r["cum_before"]
    assert got == ref
    # s3 was not listed → absent entirely
    assert not any(k[0] == "s3" for k in got)
