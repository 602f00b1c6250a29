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
