"""Unigram-LM tokenizer (SentencePiece's unigram model, Kudo 2018) —
the second trainable tokenizer family beside BPE.

Where BPE grows a vocabulary bottom-up by merging, the unigram model
starts from an OVER-complete candidate vocabulary and prunes top-down:
pieces carry log-probabilities, a word's tokenization is the Viterbi
segmentation maximizing Σ log p(piece), and training alternates

1. **E-step** (hard EM — the standard practical simplification, and
   deterministic): Viterbi-segment every word under current probs,
   accumulate piece counts weighted by word frequency;
2. **M-step**: p(piece) = count / total;
3. **prune**: drop the lowest-probability non-seed pieces (single
   characters are never pruned — every string stays encodable) until
   the vocabulary budget is met.

Spark factorization is EXACTLY the BPE trainer's: the one corpus-scale
stage is word counting (operators.bpe.capped_word_freqs — bounded
driver collect), training runs on the vocabulary-sized word table, and
corpus-scale encoding is an Arrow-batched Viterbi with a per-batch
word memo. Determinism: ties in Viterbi break toward FEWER pieces then
lexicographic; prune order ties break lexicographic.
"""

from __future__ import annotations

import math
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from etl_sentinel_imagery_spark.operators.bpe import capped_word_freqs

#: Longest candidate piece considered during seeding.
MAX_PIECE_LEN = 8


def _viterbi(word: str, logp: dict) -> list:
    """Best segmentation of ``word`` under piece log-probs: maximizes
    total logp; ties prefer fewer pieces, then lexicographically
    smaller piece sequences (stable across runs and dict orders)."""
    n = len(word)
    # best[i] = (score, n_pieces, pieces tuple) for word[:i]
    best: list = [None] * (n + 1)
    best[0] = (0.0, 0, ())
    for i in range(1, n + 1):
        cand = None
        for j in range(max(0, i - MAX_PIECE_LEN), i):
            if best[j] is None:
                continue
            piece = word[j:i]
            lp = logp.get(piece)
            if lp is None:
                continue
            sc = best[j][0] + lp
            entry = (sc, best[j][1] + 1, best[j][2] + (piece,))
            if (
                cand is None
                or entry[0] > cand[0] + 1e-15
                or (
                    abs(entry[0] - cand[0]) <= 1e-15
                    and (entry[1], entry[2]) < (cand[1], cand[2])
                )
            ):
                cand = entry
        best[i] = cand
    if best[n] is None:  # unencodable char slipped in — caller seeds chars
        return list(word)
    return list(best[n][2])


def train_unigram(
    word_freq_rows,
    vocab_size: int,
    n_em: int = 4,
    prune_rounds: int = 4,
    seed_min_freq: int = 2,
) -> dict:
    """Train on (word, freq) pairs → {piece: logp} of ≤ ``vocab_size``
    entries (all single characters always included). Seeding: every
    substring up to MAX_PIECE_LEN with corpus frequency ≥
    ``seed_min_freq``, plus all characters. Each prune round runs
    ``n_em`` hard-EM iterations then drops the weakest pieces."""
    words = [(str(w), int(f)) for w, f in word_freq_rows if str(w)]
    chars = {c for w, _ in words for c in w}
    sub_freq: dict = {}
    for w, f in words:
        for i in range(len(w)):
            for L in range(2, min(MAX_PIECE_LEN, len(w) - i) + 1):
                p = w[i : i + L]
                sub_freq[p] = sub_freq.get(p, 0) + f
    vocab = set(chars) | {
        p for p, f in sub_freq.items() if f >= seed_min_freq
    }
    # init: probs proportional to substring frequency (chars get their
    # own corpus frequency)
    char_freq: dict = {}
    for w, f in words:
        for c in w:
            char_freq[c] = char_freq.get(c, 0) + f
    freq0 = {p: sub_freq.get(p, char_freq.get(p, 1)) for p in vocab}
    total0 = sum(freq0.values())
    logp = {p: math.log(f / total0) for p, f in freq0.items()}

    def em(logp: dict) -> dict:
        for _ in range(n_em):
            counts: dict = {}
            for w, f in words:
                for piece in _viterbi(w, logp):
                    counts[piece] = counts.get(piece, 0) + f
            # unused pieces keep an epsilon so pruning (not EM) retires
            # them deterministically
            total = sum(counts.values())
            logp = {
                p: math.log(
                    (counts.get(p, 0) + 1e-9) / (total + 1e-9 * len(logp))
                )
                for p in logp
            }
        return logp

    n_target = max(vocab_size, len(chars))
    for _ in range(prune_rounds):
        logp = em(logp)
        prunable = sorted(
            (p for p in logp if len(p) > 1),
            key=lambda p: (logp[p], p),
        )
        excess = len(logp) - n_target
        if excess <= 0:
            break
        drop = prunable[: min(excess, max(1, len(prunable) // 2))]
        for p in drop:
            del logp[p]
    logp = em(logp)
    return logp


def unigram_encode_word(word: str, logp: dict) -> list:
    return _viterbi(word, logp)


def unigram_encode(
    docs: DataFrame,
    logp: dict,
    id_col: str = "doc_id",
    text_col: str = "text",
    lowercase: bool = True,
) -> DataFrame:
    """Corpus-scale Viterbi encoding: (id, pieces array<string>,
    n_pieces). Arrow-batched with the per-batch word memo (Zipf head
    segments once per batch); the model dict rides in the closure
    (vocab-sized)."""

    def _encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        memo: dict = {}

        def seg(word: str) -> list:
            got = memo.get(word)
            if got is None:
                got = memo[word] = _viterbi(word, logp)
            return got

        for pdf in batches:
            pieces_out, counts = [], []
            for text in pdf[text_col]:
                t = text or ""
                if lowercase:
                    t = t.lower()
                out: list = []
                for w in t.split(" "):
                    if w:
                        out.extend(seg(w))
                pieces_out.append(out)
                counts.append(len(out))
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "pieces": pieces_out,
                    "n_pieces": counts,
                }
            )

    return docs.select(id_col, text_col).mapInPandas(
        _encode,
        schema=f"{id_col} bigint, pieces array<string>, n_pieces int",
    )


def train_unigram_distributed(
    docs: DataFrame,
    vocab_size: int,
    text_col: str = "text",
    min_freq: int = 1,
    max_vocab: int | None = 1_000_000,
    **train_kwargs,
) -> dict:
    """End-to-end: corpus → bounded word table (the SAME corpus-scale
    stage and driver-safety cap as BPE) → unigram model (driver)."""
    rows = capped_word_freqs(docs, text_col, min_freq, max_vocab).collect()
    return train_unigram(
        [(r["word"], r["freq"]) for r in rows], vocab_size, **train_kwargs
    )
