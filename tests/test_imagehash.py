"""Perceptual image hashing: invariance/sensitivity of dHash/aHash,
banding completeness vs brute force, and the Spark pipeline over real
GIF payloads through the native decoder."""

from __future__ import annotations

import numpy as np
import pytest

from etl_sentinel_imagery_spark.operators.imagehash import (
    ahash64,
    dhash64,
    dhash_near_pairs,
    image_hashes,
)


def _img(seed: int, h=32, w=40) -> np.ndarray:
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 256, size=(h, w, 3))
    return base.astype("float64")


def test_hash_invariances_and_sensitivity():
    img = _img(5)
    d0, a0 = dhash64(img), ahash64(img)
    # brightness shift: relative comparisons unchanged
    assert dhash64(img + 40.0) == d0
    # uniform scaling preserves dhash (strict < comparisons scale)
    assert dhash64(img * 1.5) == d0
    # resize robustness: 2x upscaled image hashes identically or nearly
    big = np.repeat(np.repeat(img, 2, axis=0), 2, axis=1)
    dist = bin((dhash64(big) ^ d0) & ((1 << 64) - 1)).count("1")
    assert dist <= 6
    # different content is far
    other = _img(99)
    d_other = bin((dhash64(other) ^ d0) & ((1 << 64) - 1)).count("1")
    assert d_other > 10
    assert ahash64(other) != a0


def test_small_noise_stays_close():
    img = _img(7)
    rng = np.random.default_rng(1)
    noised = np.clip(img + rng.normal(0, 2.0, img.shape), 0, 255)
    dist = bin((dhash64(noised) ^ dhash64(img)) & ((1 << 64) - 1)).count("1")
    assert dist <= 3


def test_banding_equals_brute_force(spark):
    """dhash_near_pairs must return EXACTLY the brute-force pair set at
    max_dist<=3 (the pigeonhole guarantee), on hashes engineered to
    exercise band boundaries."""
    rng = np.random.default_rng(17)
    hashes = [int(rng.integers(0, 1 << 63)) for _ in range(30)]
    # plant close pairs by flipping <=3 bits, incl. cross-band flips
    hashes.append(hashes[0] ^ 0b1)
    hashes.append(hashes[1] ^ (1 << 15) ^ (1 << 16))  # straddles bands
    hashes.append(hashes[2] ^ (1 << 63 - 1) ^ (1 << 0) ^ (1 << 32))
    rows = [(i, h - (1 << 64) if h >= 1 << 63 else h) for i, h in enumerate(hashes)]
    df = spark.createDataFrame(rows, "doc_id bigint, dhash bigint")
    got = {
        (r["id_a"], r["id_b"], r["hamming_dist"])
        for r in dhash_near_pairs(df, max_dist=3).collect()
    }
    want = set()
    for i in range(len(hashes)):
        for j in range(i + 1, len(hashes)):
            d = bin((hashes[i] ^ hashes[j]) & ((1 << 64) - 1)).count("1")
            if d <= 3:
                want.add((i, j, d))
    assert got == want and want  # non-empty by construction
    with pytest.raises(ValueError, match="bands"):
        dhash_near_pairs(df, max_dist=7)


def test_spark_pipeline_over_gif_payloads(spark):
    """GIF payloads → native decode → hashes → banded pairs: the
    planted near-identical image pairs with its source; corrupt
    payloads quarantine."""
    from etl_sentinel_imagery_spark.functions.gif import encode_gif

    rng = np.random.default_rng(23)
    gray = np.arange(256, dtype=np.uint8)
    palette = np.stack([gray, gray, gray], axis=1)
    base = rng.integers(0, 256, size=(24, 24), dtype=np.uint8)
    near = base.copy()
    near[0, 0] ^= 1  # single-pixel change
    far = rng.integers(0, 256, size=(24, 24), dtype=np.uint8)
    media = spark.createDataFrame(
        [
            (1, bytearray(encode_gif(base[None], palette))),
            (2, bytearray(encode_gif(near[None], palette))),
            (3, bytearray(encode_gif(far[None], palette))),
            (4, bytearray(b"not an image")),
        ],
        "doc_id bigint, payload binary",
    )
    hashes = image_hashes(media)
    rows = {r["doc_id"]: r for r in hashes.collect()}
    assert rows[4]["dhash"] is None and rows[4]["decode_error"]
    assert rows[1]["dhash"] == rows[2]["dhash"]  # sub-pixel change
    pairs = dhash_near_pairs(hashes, max_dist=3).collect()
    assert {(r["id_a"], r["id_b"]) for r in pairs} == {(1, 2)}
