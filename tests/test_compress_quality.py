"""Compression quality signals: reference parity, signal ordering,
determinism."""

from __future__ import annotations

import math
import zlib

import numpy as np

from etl_sentinel_imagery_spark.operators.compress_quality import (
    ZLIB_LEVEL,
    compression_signals,
    repetitive_doc_ids,
)

# long enough that DEFLATE header overhead doesn't dominate (a 128-byte
# "natural" doc compresses WORSE than repeated noise — found empirically)
NATURAL = (
    "the migration patterns of arctic terns span both hemispheres and "
    "follow the long daylight of each polar summer across open water. "
    "glacier fed lakes hold their clarity through late august when "
    "meltwater slows and sediment settles to the valley floor. harbor "
    "seals haul out on the shingle beaches at low tide while gulls work "
    "the wrack line for stranded crabs. the old lighthouse keeper "
    "logged wind speed and pressure twice daily for forty one years "
    "without missing an entry."
)
SPAM = "buy now " * 80


def _hash_chain_noise(n_blocks=12):
    import base64
    import hashlib

    seed, out = b"q", []
    for _ in range(n_blocks):
        seed = hashlib.sha256(seed).digest()
        out.append(base64.b64encode(seed).decode())
    return " ".join(out)


RANDOMISH = _hash_chain_noise()


def _ref(text):
    raw = text.encode("utf-8")
    ratio = len(zlib.compress(raw, ZLIB_LEVEL)) / len(raw)
    counts = np.bincount(np.frombuffer(raw, dtype=np.uint8), minlength=256)
    p = counts[counts > 0] / len(raw)
    return ratio, float(-(p * np.log2(p)).sum())


def test_matches_reference_and_orders_signals(spark):
    docs = spark.createDataFrame(
        [(1, NATURAL), (2, SPAM), (3, RANDOMISH), (4, "")],
        "doc_id bigint, text string",
    )
    got = {r["doc_id"]: r for r in compression_signals(docs).collect()}
    for i, t in [(1, NATURAL), (2, SPAM), (3, RANDOMISH)]:
        ratio, ent = _ref(t)
        assert math.isclose(got[i]["zlib_ratio"], ratio, rel_tol=0)
        assert math.isclose(got[i]["byte_entropy"], ent, rel_tol=1e-12)
        assert got[i]["n_bytes"] == len(t.encode())
    # spam compresses hardest; random-ish text compresses worst
    assert got[2]["zlib_ratio"] < got[1]["zlib_ratio"] < got[3]["zlib_ratio"]
    assert got[4]["zlib_ratio"] == 0.0 and got[4]["byte_entropy"] == 0.0


def test_repetitive_filter_drops_only_spam(spark):
    docs = spark.createDataFrame(
        [(1, NATURAL), (2, SPAM)], "doc_id bigint, text string"
    )
    bad = {r["doc_id"] for r in repetitive_doc_ids(docs, 0.25).collect()}
    assert bad == {2}


def test_deterministic_across_partitionings(spark):
    docs = spark.createDataFrame(
        [(i, f"document body {i} with words {'x' * (i % 17)}") for i in range(40)],
        "doc_id bigint, text string",
    )
    a = {r["doc_id"]: r["zlib_ratio"] for r in compression_signals(docs).collect()}
    b = {
        r["doc_id"]: r["zlib_ratio"]
        for r in compression_signals(docs.repartition(7)).collect()
    }
    assert a == b
