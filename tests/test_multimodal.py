"""Multimodal binary-column plumbing tests (decode stub + real kernels)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_sentinel_imagery_spark.operators.multimodal import (
    attach_synthetic_media,
    byte_histogram,
    decode_and_summarize,
    default_decoder,
    fake_decoder,
    sample_frames,
)
from etl_sentinel_imagery_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def media(spark):
    docs = load_table(spark, SF_DIR, "documents").limit(20)
    return attach_synthetic_media(docs)


def test_media_schema_and_meta(media):
    row = media.first()
    assert isinstance(row["payload"], bytes)
    assert row["meta"]["mime"] == "application/x-fake"
    assert row["meta"]["width"] >= 16 and row["meta"]["height"] >= 12


def test_byte_histogram_counts(spark, media):
    hists = byte_histogram(media).collect()
    raw = {r["doc_id"]: r["payload"] for r in media.collect()}
    assert len(hists) == 20
    for r in hists:
        assert len(r["histogram"]) == 256
        assert sum(r["histogram"]) == len(raw[r["doc_id"]])
        # docs are lowercase words + spaces → histogram mass in [a-z]+space
        assert r["histogram"][ord(" ")] > 0


def test_decode_stub_raises_without_library(media):
    with pytest.raises(Exception) as ei:
        decode_and_summarize(media.limit(1), decoder=default_decoder).collect()
    assert "NotImplementedError" in str(ei.value) or "imaging library" in str(ei.value)


def test_decode_with_injected_decoder(media):
    out = decode_and_summarize(media, decoder=fake_decoder).collect()
    metas = {r["doc_id"]: r["meta"] for r in media.collect()}
    assert len(out) == 20
    for r in out:
        assert r["height"] == metas[r["doc_id"]]["height"]
        assert r["width"] == metas[r["doc_id"]]["width"]
        assert len(r["channel_means"]) == 3
        assert all(0.0 <= m <= 255.0 for m in r["channel_means"])


def test_frame_sampling(media):
    frames = sample_frames(media, every_nth=2).collect()
    metas = {r["doc_id"]: r["meta"]["n_frames"] for r in media.collect()}
    by_doc: dict[int, list[int]] = {}
    for r in frames:
        by_doc.setdefault(r["doc_id"], []).append(r["frame_idx"])
    for doc_id, idxs in by_doc.items():
        nf = metas[doc_id]
        assert sorted(idxs) == list(range(0, nf, 2))
        assert all(isinstance(r["frame_bytes"], bytes) for r in frames)
