"""Compression-based text quality signals.

Highly repetitive or machine-generated text compresses far better than
natural prose, and random/encrypted junk compresses worse — so
compressed-size ratio is a standard web-curation signal alongside the
repetition ratios (used in Gopher-style pipelines and the common-crawl
literature; zlib is the stdlib workhorse). Byte entropy is its
model-free sibling (natural English plateaus ~4.2 bits/byte; base64 or
random bytes push toward 6-8).

Arrow-batched mapInPandas (zlib is C-speed but per-payload — the
explode/JVM route does not exist for DEFLATE); both signals are
deterministic for a fixed zlib level, and the level is pinned so
re-runs and engines agree byte-for-byte. Like every ln-bearing
operator (tfidf/bm25/lm_score), entropy stays pytest-verified rather
than hash-battery-verified.
"""

from __future__ import annotations

import math
import zlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

#: Pinned so the ratio is reproducible across runs and machines.
ZLIB_LEVEL = 6


def compression_signals(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, n_bytes, zlib_ratio, byte_entropy) per document.

    - ``zlib_ratio`` = compressed/raw size (level 6). Boilerplate and
      repeated spans push it toward 0; random bytes push past 1 (header
      overhead). Empty docs report ratio 0.0.
    - ``byte_entropy``: Shannon entropy of the UTF-8 byte histogram in
      bits/byte (0 for empty docs).
    """

    def _sig(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for key, text in zip(pdf[id_col], pdf[text_col]):
                raw = (text or "").encode("utf-8")
                n = len(raw)
                if n == 0:
                    rows.append((key, 0, 0.0, 0.0))
                    continue
                ratio = len(zlib.compress(raw, ZLIB_LEVEL)) / n
                counts = np.bincount(
                    np.frombuffer(raw, dtype=np.uint8), minlength=256
                )
                p = counts[counts > 0] / n
                entropy = float(-(p * np.log2(p)).sum())
                rows.append((key, n, ratio, entropy))
            yield pd.DataFrame(
                rows,
                columns=[id_col, "n_bytes", "zlib_ratio", "byte_entropy"],
            )

    return docs.mapInPandas(
        _sig,
        schema=(
            f"{id_col} bigint, n_bytes int, zlib_ratio double, "
            "byte_entropy double"
        ),
    )


def repetitive_doc_ids(
    docs: DataFrame,
    max_ratio: float,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Ids of documents compressing BELOW ``max_ratio`` — the
    boilerplate/spam tail a curation pass drops (compose with an
    anti-join, the contaminated_train_ids pattern)."""
    return (
        compression_signals(docs, id_col, text_col)
        .where(f"zlib_ratio < {float(max_ratio)} AND n_bytes > 0")
        .select(id_col)
    )
