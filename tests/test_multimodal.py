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


def test_embed_text_to_ivf_near_dup_end_to_end(spark, tmp_path):
    """The full text → embedding → persisted IVF → near-dup composition:
    exact duplicate texts embed identically (cosine 1) and surface as
    each other's top-1 neighbors through the index; the encoder is
    deterministic across partitionings."""
    from pyspark.sql import functions as F

    from etl_sentinel_imagery_spark.operators.kmeans import fit
    from etl_sentinel_imagery_spark.operators.multimodal import embed_text
    from etl_sentinel_imagery_spark.operators.similarity import (
        ivf_topk_indexed_adaptive,
        write_ivf_index,
    )
    from etl_sentinel_imagery_spark.sources.tables import load_table

    docs = load_table(spark, SF_DIR, "documents").limit(200)
    # plant exact duplicates with fresh ids
    dups = docs.filter(F.col("doc_id") < 5).withColumn(
        "doc_id", F.col("doc_id") + 100000
    )
    corpus = docs.unionByName(dups)

    emb = embed_text(corpus, "doc_id", "text").withColumnRenamed(
        "doc_id", "vec_id"
    )
    # determinism across partitionings
    a = {r["vec_id"]: r["embedding"] for r in emb.collect()}
    b = {
        r["vec_id"]: r["embedding"]
        for r in embed_text(corpus.repartition(7), "doc_id", "text")
        .withColumnRenamed("doc_id", "vec_id")
        .collect()
    }
    assert a == b

    cents, _ = fit(emb, k=4, n_iter=2)
    path = str(tmp_path / "text_ivf")
    write_ivf_index(emb, cents, path)
    queries = emb.filter(F.col("vec_id") >= 100000)
    hits = ivf_topk_indexed_adaptive(
        spark, path, queries, cents, k=1, n_probe=2
    ).collect()
    # every planted dup's nearest neighbor is its original, at cosine ~1
    assert len(hits) == 5
    for r in hits:
        assert r["cand_id"] == r["query_id"] - 100000
        assert abs(r["cos_sim"] - 1.0) < 1e-9
