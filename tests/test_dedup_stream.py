"""Streaming LSH: candidate pairs across micro-batches must equal the
batch operator's (uncapped) candidate set on the same bounded corpus."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_sentinel_imagery_spark.operators.dedup import minhash_lsh_pairs
from etl_sentinel_imagery_spark.sources.tables import load_table
from etl_sentinel_imagery_spark.streaming.dedup_stream import (
    band_key_rows,
    lsh_candidate_pairs_stream,
)
from etl_sentinel_imagery_spark.streaming.events import run_to_memory
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def docs_stream_dir(spark, tmp_path_factory):
    """Corpus staged as FOUR files so maxFilesPerTrigger=1 forces pairs
    to form across micro-batch boundaries (doc in batch 3 vs bucket
    state from batch 1)."""
    out = str(tmp_path_factory.mktemp("docs_stream") / "docs")
    load_table(spark, SF_DIR, "documents").repartition(4).write.parquet(out)
    return out


def test_stream_candidates_match_batch(spark, docs_stream_dir):
    docs_batch = spark.read.parquet(docs_stream_dir)
    stream = (
        spark.readStream.schema(docs_batch.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(docs_stream_dir)
    )
    out = run_to_memory(
        lsh_candidate_pairs_stream(stream, max_bucket=10_000),
        "lsh_stream_mem",
        "append",
    )
    got = {(r["id_a"], r["id_b"]) for r in out.collect()}
    want = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(
            docs_batch, "doc_id", "text", max_bucket=None
        ).collect()
    }
    assert got == want and got


def test_stream_bucket_cap_bounds_pairs(spark, tmp_path):
    """200 identical docs, cap 16 → per band at most C(16,2) pairs, not
    C(200,2): the stream admits a prefix of each bucket."""
    n = 200
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.lit("the same boilerplate footer text repeated verbatim").alias("text"),
    )
    p = str(tmp_path / "boiler")
    docs.repartition(2).write.parquet(p)
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(p)
    )
    out = run_to_memory(
        lsh_candidate_pairs_stream(stream, max_bucket=16),
        "lsh_cap_mem",
        "append",
    )
    rows = out.collect()
    n_bands = 4
    assert 0 < len(rows) <= n_bands * 16 * 15 // 2
    # per band: exactly C(16,2) pairs from the admitted prefix
    per_band = {}
    for r in rows:
        per_band[r["band_idx"]] = per_band.get(r["band_idx"], 0) + 1
    assert all(v == 16 * 15 // 2 for v in per_band.values())


def test_band_keys_identical_to_batch_construction(spark):
    """A doc must land in the same buckets in either mode — the property
    that lets a streaming ingest layer and a batch backfill share one
    candidate space."""
    docs = load_table(spark, SF_DIR, "documents").limit(100)
    a = {
        (r["doc"], r["band_idx"], r["band_key"])
        for r in band_key_rows(docs, "doc_id", "text").collect()
    }
    assert len(a) == 100 * 4
    # re-derive via the batch signature path
    from etl_sentinel_imagery_spark.operators.dedup import minhash_signature

    sigs = {
        r["doc_id"]: r["s"]
        for r in docs.select(
            "doc_id", minhash_signature(F.col("text")).alias("s")
        ).collect()
    }
    for doc, band_idx, band_key in a:
        s = sigs[doc]
        expect = f"{s[band_idx * 2]}_{s[band_idx * 2 + 1]}"
        assert band_key == expect


def test_ttl_expires_idle_bucket_state_real_clock(spark, tmp_path):
    """The processing-time TTL branch, driven by a REAL continuous
    trigger (the one path processAllAvailable cannot exercise — it
    hangs when timeouts keep scheduling no-data batches): docs seen
    before an idle period longer than the TTL must NOT pair with docs
    arriving after it, while a fresh duplicate pair in the late batch
    still pairs (proving the late batch was processed)."""
    import time

    from pyspark.sql import functions as F

    from etl_sentinel_imagery_spark.streaming.dedup_stream import (
        lsh_candidate_pairs_stream,
    )

    src = str(tmp_path / "docs")
    schema = "doc_id bigint, text string"
    text = "the quick brown fox jumps over the lazy dog again and again"
    fresh = "completely different sentinel content marching in step here"
    spark.createDataFrame([(1, text), (2, text)], schema).coalesce(
        1
    ).write.mode("overwrite").parquet(src)

    stream = (
        spark.readStream.schema(schema).parquet(src)
    )
    pairs = lsh_candidate_pairs_stream(stream, ttl_ms=2000)
    q = (
        pairs.writeStream.format("memory")
        .queryName("ttl_pairs")
        .outputMode("append")
        .trigger(processingTime="500 milliseconds")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        def seen():
            return {
                (r["id_a"], r["id_b"])
                for r in spark.sql(
                    "SELECT DISTINCT id_a, id_b FROM ttl_pairs"
                ).collect()
            }

        deadline = time.time() + 60
        while (1, 2) not in seen() and time.time() < deadline:
            time.sleep(0.5)
        assert (1, 2) in seen(), "initial duplicate pair never emitted"

        time.sleep(8)  # idle — 4× the TTL; empty batches fire expiry

        spark.createDataFrame(
            [(3, text), (4, fresh), (5, fresh)], schema
        ).coalesce(1).write.mode("append").parquet(src)
        deadline = time.time() + 60
        while (4, 5) not in seen() and time.time() < deadline:
            time.sleep(0.5)
        assert (4, 5) in seen(), "late batch never processed"

        stale = {p for p in seen() if 3 in p and (1 in p or 2 in p)}
        assert not stale, f"expired bucket still paired: {stale}"
    finally:
        q.stop()
