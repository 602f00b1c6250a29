"""Distributed BPE (byte-pair-encoding) tokenizer training + encoding.

The shape every production tokenizer trainer (HF tokenizers,
SentencePiece in BPE mode) uses, mapped onto Spark:

1. **Corpus → word-frequency table** (:func:`word_freqs`) — THE
   100 TB step. One explode + map-side-combinable groupBy; the output
   is VOCABULARY-sized (sub-millions of rows at web scale — Heaps'
   law), i.e. control-plane data, however large the corpus was.
2. **Merge training on the frequency table** (:func:`train_bpe`) —
   classic greedy BPE over (word, freq) rows: adjacent-symbol-pair
   counts are weighted by word frequency, the most frequent pair
   merges, repeat. Runs driver-side because its working set is the
   word table, NOT the corpus — the same reason HF trains on a word
   counter. Deterministic: ties break lexicographically.
3. **Encoding back at corpus scale** (:func:`bpe_encode`) — an
   Arrow-batched pandas UDF applying the learned merge ranks
   greedily (lowest-rank pair first, the standard BPE encode), with a
   per-batch word→tokens memo so each distinct word is encoded once
   per batch. Emits tokens + token count — the exact token-budget
   accounting a packing/curriculum pipeline needs.

Word-boundary markers use the end-of-word suffix convention
(``</w>``), so merges never cross words and the word-frequency
factorization is EXACT: training on (word, freq) is equivalent to
training on the raw corpus — the property the tests pin against an
independent naive corpus-level implementation.

Extension beyond the reference (which has no text pipeline): this is
the trainable counterpart of the BPE-ish regex counting in
queries/text_q.py.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_sentinel_imagery_spark.functions.text import tokens

#: End-of-word marker appended to each word's final symbol.
EOW = "</w>"


def word_freqs(
    docs: DataFrame, text_col: str = "text", lowercase: bool = True
) -> DataFrame:
    """(word, freq) over the corpus — one explode + one combinable
    groupBy shuffle. This is the only corpus-scale stage of training."""
    col = F.col(text_col)
    if lowercase:
        col = F.lower(col)
    return (
        docs.select(F.explode(tokens(col)).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _symbols(word: str) -> tuple:
    """Initial symbol sequence: chars, last one carrying the EOW mark."""
    if not word:
        return ()
    chars = list(word)
    chars[-1] = chars[-1] + EOW
    return tuple(chars)


def train_bpe(word_freq_rows, n_merges: int) -> list:
    """Greedy BPE merge list from (word, freq) pairs.

    ``word_freq_rows``: iterable of (word, freq) — pass
    ``word_freqs(df).collect()`` (vocabulary-sized). Returns the ordered
    merge list [(left, right), ...]; rank = position. Deterministic:
    the most frequent pair wins, ties break lexicographically.

    Complexity is O(n_merges × vocab × word_len) with incremental pair
    recounting restricted to the words that actually contain the merged
    pair — the standard trainer loop."""
    words: dict[tuple, int] = {}
    for w, f in word_freq_rows:
        sym = _symbols(str(w))
        if sym:
            words[sym] = words.get(sym, 0) + int(f)

    def pair_counts(ws: dict) -> dict:
        pc: dict[tuple, int] = {}
        for sym, f in ws.items():
            for i in range(len(sym) - 1):
                p = (sym[i], sym[i + 1])
                pc[p] = pc.get(p, 0) + f
        return pc

    merges: list[tuple] = []
    pc = pair_counts(words)
    for _ in range(n_merges):
        if not pc:
            break
        best_count = max(pc.values())
        best_pair = min(p for p, c in pc.items() if c == best_count)
        merges.append(best_pair)
        merged = best_pair[0] + best_pair[1]
        changed = {}
        for sym, f in words.items():
            if best_pair[0] not in sym:
                continue
            out = []
            i = 0
            hit = False
            while i < len(sym):
                if (
                    i + 1 < len(sym)
                    and sym[i] == best_pair[0]
                    and sym[i + 1] == best_pair[1]
                ):
                    out.append(merged)
                    i += 2
                    hit = True
                else:
                    out.append(sym[i])
                    i += 1
            if hit:
                changed[sym] = tuple(out)
        for old, new in changed.items():
            f = words.pop(old)
            # decrement old pair counts, increment new — incremental
            for i in range(len(old) - 1):
                p = (old[i], old[i + 1])
                pc[p] -= f
                if pc[p] <= 0:
                    del pc[p]
            for i in range(len(new) - 1):
                p = (new[i], new[i + 1])
                pc[p] = pc.get(p, 0) + f
            words[new] = words.get(new, 0) + f
    return merges


def encode_word(word: str, ranks: dict) -> list:
    """Standard BPE encode of one word: repeatedly merge the present
    pair with the LOWEST rank until no learned pair remains."""
    sym = list(_symbols(word))
    while len(sym) > 1:
        best_rank, best_i = None, None
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            break
        sym[best_i : best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


def bpe_encode(
    docs: DataFrame,
    merges: list,
    id_col: str = "doc_id",
    text_col: str = "text",
    lowercase: bool = True,
) -> DataFrame:
    """Corpus-scale encoding with the learned merges: (id, bpe_tokens
    array<string>, n_bpe_tokens). Arrow-batched; a per-batch word memo
    collapses the Zipf head (each distinct word encodes once per
    batch). The merge table rides in the closure (vocab-sized —
    broadcast-scale by construction)."""
    ranks = {tuple(p): i for i, p in enumerate(merges)}

    def _encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        memo: dict[str, list] = {}

        def enc(word: str) -> list:
            got = memo.get(word)
            if got is None:
                got = memo[word] = encode_word(word, ranks)
            return got

        for pdf in batches:
            toks_out, counts = [], []
            for text in pdf[text_col]:
                t = (text or "")
                if lowercase:
                    t = t.lower()
                out: list = []
                # split(" ") + empty filter matches functions.text.tokens
                # (the training-side tokenizer) exactly — .split() with
                # no arg would treat tabs/newlines differently
                for w in t.split(" "):
                    if w:
                        out.extend(enc(w))
                toks_out.append(out)
                counts.append(len(out))
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "bpe_tokens": toks_out,
                    "n_bpe_tokens": counts,
                }
            )

    return docs.select(id_col, text_col).mapInPandas(
        _encode,
        schema=f"{id_col} bigint, bpe_tokens array<string>, n_bpe_tokens int",
    )


def capped_word_freqs(
    docs: DataFrame,
    text_col: str = "text",
    min_freq: int = 1,
    max_vocab: int | None = 1_000_000,
) -> DataFrame:
    """:func:`word_freqs` bounded to a driver-safe size.

    A web-scale corpus's distinct-"word" table (typos, URLs, hex hashes)
    is effectively unbounded — Heaps' law gives sub-millions of NATURAL
    words, but the tail of junk tokens grows with the corpus, so an
    uncapped ``collect()`` is a driver OOM at exactly the scale training
    targets. Standard BPE practice bounds it twice: a frequency floor
    (``min_freq``) and a top-``max_vocab`` cap (freq desc, word asc —
    deterministic). The cap runs as ``orderBy().limit()`` ⇒ Spark's
    TakeOrderedAndProject, a distributed per-partition top-V + driver
    merge — never a single-partition global sort.

    Exactness note: with a non-binding cap, training on the word table
    is EXACTLY corpus-level BPE (the tested property). When the cap
    binds, dropped rare words stop contributing their (tiny) pair
    counts — the same approximation HF/SentencePiece make, and rare
    words can't win merges anyway when n_merges ≪ vocab."""
    wf = word_freqs(docs, text_col)
    if min_freq > 1:
        wf = wf.where(F.col("freq") >= min_freq)
    if max_vocab is not None:
        wf = wf.orderBy(F.desc("freq"), F.asc("word")).limit(max_vocab)
    return wf


def train_bpe_distributed(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
    min_freq: int = 1,
    max_vocab: int | None = 1_000_000,
) -> list:
    """End-to-end: corpus → bounded word table (Spark) → merges (driver).

    The collect is capped at ``max_vocab`` rows (default 1M ≈ tens of MB
    — control-plane-sized by construction); see
    :func:`capped_word_freqs` for the bounding semantics."""
    rows = capped_word_freqs(docs, text_col, min_freq, max_vocab).collect()
    return train_bpe([(r["word"], r["freq"]) for r in rows], n_merges)


def chunk_documents_bpe(
    docs: DataFrame,
    merges: list,
    chunk_tokens: int = 256,
    id_col: str = "doc_id",
    text_col: str = "text",
    lowercase: bool = True,
) -> DataFrame:
    """Chunk documents by REAL BPE token budget — the upgrade over
    functions.text.chunk_documents, whose windows count whitespace
    tokens and therefore only approximate what a model context window
    holds.

    Chunks split at WORD boundaries: the ``</w>`` end-of-word marker
    means merges never cross words, so a word-aligned split is
    token-exact — sum of chunk token counts == the document's count,
    and re-encoding any chunk yields exactly its ``n_bpe_tokens``.
    Greedy fill: words pack into the current chunk until the budget
    would overflow. A single word whose encoding alone exceeds the
    budget becomes its own over-budget chunk (splitting it mid-word
    would change its tokenization — documented, not silent).

    Arrow-batched mapInPandas with the per-batch word→length memo
    (the Zipf head encodes once per batch); the merge table rides in
    the closure (vocab-sized). Output: (id, chunk_idx, chunk_text,
    n_bpe_tokens); empty/whitespace-only docs yield zero chunks.
    """
    if chunk_tokens <= 0:
        raise ValueError("chunk_tokens must be positive")
    ranks = {tuple(p): i for i, p in enumerate(merges)}

    def _chunk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        memo: dict[str, int] = {}

        def n_tok(word: str) -> int:
            got = memo.get(word)
            if got is None:
                got = memo[word] = len(encode_word(word, ranks))
            return got

        for pdf in batches:
            ids, idxs, texts, counts = [], [], [], []
            for key, text in zip(pdf[id_col], pdf[text_col]):
                t = text or ""
                if lowercase:
                    t = t.lower()
                words = [w for w in t.split(" ") if w]
                cur: list[str] = []
                cur_n = 0
                out_chunks: list[tuple[list[str], int]] = []
                for w in words:
                    n = n_tok(w)
                    if cur and cur_n + n > chunk_tokens:
                        out_chunks.append((cur, cur_n))
                        cur, cur_n = [], 0
                    cur.append(w)
                    cur_n += n
                if cur:
                    out_chunks.append((cur, cur_n))
                for chunk_idx, (cw, cn) in enumerate(out_chunks):
                    ids.append(key)
                    idxs.append(chunk_idx)
                    texts.append(" ".join(cw))
                    counts.append(cn)
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype="int64"),
                    "chunk_idx": pd.Series(idxs, dtype="int32"),
                    "chunk_text": pd.Series(texts, dtype="object"),
                    "n_bpe_tokens": pd.Series(counts, dtype="int32"),
                }
            )

    return docs.select(id_col, text_col).mapInPandas(
        _chunk,
        schema=(
            f"{id_col} bigint, chunk_idx int, chunk_text string, "
            "n_bpe_tokens int"
        ),
    )


# --- tokenizer artifact persistence --------------------------------------
#: Artifact layout: <dir>/v_<hash>.json holding {"version", "n_merges",
#: "merges": [[l, r], ...]}, plus a _CURRENT pointer file naming the
#: committed version — the same versioned-pointer protocol as the IVF
#: bucket-stats sidecar, so a crash mid-save never leaves a reader
#: seeing a half-written tokenizer (which would silently change every
#: downstream token count).


def save_tokenizer(merges: list, dir_path: str) -> str:
    """Commit the merge list as a versioned tokenizer artifact; returns
    the version name. Content-addressed (sha256 of the merge list), so
    re-saving an identical tokenizer is a no-op that re-points to the
    existing version."""
    import hashlib
    import json
    import os

    payload = json.dumps(
        {"n_merges": len(merges), "merges": [list(p) for p in merges]},
        separators=(",", ":"),
    )
    version = "v_" + hashlib.sha256(payload.encode()).hexdigest()[:16]
    os.makedirs(dir_path, exist_ok=True)
    vfile = os.path.join(dir_path, f"{version}.json")
    if not os.path.exists(vfile):
        tmp = vfile + ".tmp"
        with open(tmp, "w") as f:
            f.write(payload)
        os.replace(tmp, vfile)  # atomic on POSIX
    ptr_tmp = os.path.join(dir_path, "_CURRENT.tmp")
    with open(ptr_tmp, "w") as f:
        f.write(version)
    os.replace(ptr_tmp, os.path.join(dir_path, "_CURRENT"))
    return version


def load_tokenizer(dir_path: str, version: str | None = None) -> list:
    """Load a committed tokenizer (the _CURRENT version by default, or a
    pinned one — reproducing an old run needs its exact merges)."""
    import json
    import os

    if version is None:
        with open(os.path.join(dir_path, "_CURRENT")) as f:
            version = f.read().strip()
    with open(os.path.join(dir_path, f"{version}.json")) as f:
        data = json.load(f)
    return [tuple(p) for p in data["merges"]]
