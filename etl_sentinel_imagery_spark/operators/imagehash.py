"""Perceptual image hashing + banded near-duplicate image pairs.

The image-side analog of the text MinHash pipeline: a 64-bit
perceptual hash per image (dHash — gradient signs over a 9×8
downsample; aHash — above-mean bits over 8×8), then LSH-style banding
to find near-duplicate PAIRS without an all-pairs scan:

- the 64-bit hash splits into 4 bands of 16 bits;
- by pigeonhole, any pair within Hamming distance ≤ 3 agrees EXACTLY
  on at least one band, so an equi-join on (band_idx, band_value)
  meets every qualifying pair (the same guarantee shape as MinHash
  banding, here exact rather than probabilistic);
- candidates verify with the exact popcount distance (bit_count over
  XOR — a JVM expression), and duplicate candidate pairs from
  multi-band agreement collapse with one distinct.

Hashing runs over the injectable decoder seam (operators.multimodal)
— GeoTIFF and GIF payloads hash natively via the pure-numpy codecs;
the downsample is the engine's own half-pixel-center bilinear kernel
(operators.raster.resize_bilinear), so no new image math is introduced.

dHash/aHash are public-domain classics (the common attribution is
Krawetz's "Kind of Like That"/"Looks Like It" write-ups); robustness
to re-encode/resize/brightness comes from comparing RELATIVE
luminance, not pixel values.
"""

from __future__ import annotations

from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_sentinel_imagery_spark.operators.multimodal import default_decoder
from etl_sentinel_imagery_spark.operators.raster import resize_bilinear

#: 4 bands × 16 bits: banding catches every pair with distance ≤ 3.
N_BANDS = 4
BAND_BITS = 16


def _to_signed64(v: int) -> int:
    return v - (1 << 64) if v >= (1 << 63) else v


def _gray(img: np.ndarray) -> np.ndarray:
    """(H, W, C) → float64 luminance (plain channel mean — hash bits
    compare relative values, so the exact luma weights don't matter)."""
    return np.asarray(img, dtype="float64").mean(axis=2)


def dhash64(img: np.ndarray) -> int:
    """Difference hash: 9×8 downsample, bit = left pixel < right pixel
    (row-major, 64 bits). Returns a SIGNED 64-bit int (Spark bigint)."""
    g = _gray(img)
    small = resize_bilinear(g[:, :, None], 8, 9)[:, :, 0]
    bits = (small[:, :-1] < small[:, 1:]).flatten()
    v = 0
    for b in bits:
        v = (v << 1) | int(b)
    return _to_signed64(v)


def ahash64(img: np.ndarray) -> int:
    """Average hash: 8×8 downsample, bit = pixel > mean."""
    g = _gray(img)
    small = resize_bilinear(g[:, :, None], 8, 8)[:, :, 0]
    bits = (small > small.mean()).flatten()
    v = 0
    for b in bits:
        v = (v << 1) | int(b)
    return _to_signed64(v)


def image_hashes(
    media: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    decoder: Callable[[bytes, dict], np.ndarray] = default_decoder,
) -> DataFrame:
    """(id, dhash, ahash) per payload — Arrow-batched; undecodable
    payloads land with NULL hashes and a ``decode_error`` (the
    quarantine policy of every media operator here)."""

    def _hash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                try:
                    img = decoder(bytes(r[payload_col]), r.get("meta"))
                    rows.append(
                        (r[id_col], dhash64(img), ahash64(img), None)
                    )
                except (ValueError, KeyError, IndexError,
                        NotImplementedError) as e:
                    rows.append((r[id_col], None, None, str(e)))
            yield pd.DataFrame(
                rows, columns=[id_col, "dhash", "ahash", "decode_error"]
            )

    return media.mapInPandas(
        _hash,
        schema=(
            f"{id_col} bigint, dhash bigint, ahash bigint, "
            "decode_error string"
        ),
    )


def dhash_near_pairs(
    hashes: DataFrame,
    max_dist: int = 3,
    id_col: str = "doc_id",
    hash_col: str = "dhash",
) -> DataFrame:
    """All (a, b) id pairs with popcount(dhash_a XOR dhash_b) ≤
    ``max_dist`` — banded equi-join, never all-pairs.

    Exactness: with 4 bands of 16 bits, ≤ 3 differing bits leave ≥ 1
    band identical (pigeonhole), so the band join meets every
    qualifying pair; ``max_dist`` > N_BANDS−1 raises rather than
    silently missing pairs. Arithmetic shift + mask band-extracts
    correctly on signed longs (the mask clears the sign-extension)."""
    if max_dist > N_BANDS - 1:
        raise ValueError(
            f"banding with {N_BANDS} bands only guarantees distance <= "
            f"{N_BANDS - 1}; raise N_BANDS for larger radii"
        )
    h = hashes.where(F.col(hash_col).isNotNull()).select(
        F.col(id_col).alias("_id"), F.col(hash_col).alias("_h")
    )
    bands = F.array(
        *[
            F.struct(
                F.lit(j).alias("band"),
                F.shiftright(F.col("_h"), j * BAND_BITS)
                .bitwiseAND(F.lit((1 << BAND_BITS) - 1))
                .alias("val"),
            )
            for j in range(N_BANDS)
        ]
    )
    banded = h.select("_id", "_h", F.explode(bands).alias("_b")).select(
        "_id", "_h", F.col("_b.band").alias("_band"), F.col("_b.val").alias("_val")
    )
    a = banded.select(
        F.col("_id").alias("id_a"), F.col("_h").alias("_ha"), "_band", "_val"
    )
    b = banded.select(
        F.col("_id").alias("id_b"), F.col("_h").alias("_hb"), "_band", "_val"
    )
    dist = F.bit_count(F.col("_ha").bitwiseXOR(F.col("_hb")))
    return (
        a.join(b, ["_band", "_val"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", dist.alias("hamming_dist"))
        .where(F.col("hamming_dist") <= max_dist)
        .distinct()
    )
