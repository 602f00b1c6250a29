"""N-gram language-model quality scoring — the CCNet-style filter.

Web-corpus curation ranks documents by how "natural" their text is
under a language model trained on trusted text, then drops the worst
tail (Wenzek et al. 2020, CCNet, uses KenLM perplexity; the Gopher and
RefinedWeb pipelines keep the same stage). KenLM is a native library;
the distributed re-expression here is an interpolated bigram model —
the smallest LM that still separates fluent text from shuffled-word and
gibberish documents, trainable and servable entirely with built-in
Spark expressions:

- `train_bigram_lm`: one pass over the training docs → vocabulary
  (top-V unigrams, rest → `<unk>`) + bigram counts with a `<s>` start
  token. Both tables come from map-side-combinable groupBys; the
  vocabulary cap bounds the model at V + O(observed bigrams) rows.
- `score_docs`: per document, mean negative log probability per token
  under the interpolated estimate
  p(w|v) = λ·c(v,w)/c(v) + (1−λ)·(c(w)+1)/(T+V)
  (maximum-likelihood bigram backed off to add-one unigram — a
  standard Jelinek-Mercer interpolation, so unseen bigrams score low
  but never −∞). Scoring joins the doc's bigrams against the model:
  the bigram table broadcasts when small, else the join shuffles on
  the bigram key — per-doc aggregation is one combinable groupBy.

Scale: training = two combinable shuffles (unigram, bigram key
spaces); scoring = one join + one groupBy on doc id. The model tables
are data, not driver state — nothing corpus-sized is ever collected.
Like tfidf/bm25, ln keeps scores pytest-verified (libm last-ulp
variance) rather than hash-battery-verified.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_sentinel_imagery_spark.functions.text import tokens

BOS = "<s>"
UNK = "<unk>"


@dataclass
class BigramLM:
    """Model tables + scalars. ``unigrams``: (w, c_w); ``bigrams``:
    (v, w, c_vw); ``context_totals``: (v, c_v); ``total_tokens`` is the
    unigram mass T (excl. BOS), ``vocab_size`` = |vocabulary| + 1 for
    UNK."""

    unigrams: DataFrame
    bigrams: DataFrame
    context_totals: DataFrame
    total_tokens: int
    vocab_size: int
    lam: float


def train_bigram_lm(
    docs: DataFrame,
    text_col: str = "text",
    max_vocab: int = 50_000,
    lam: float = 0.8,
) -> BigramLM:
    """Train the interpolated bigram LM over ``docs``.

    Vocabulary = the ``max_vocab`` most frequent tokens (ties broken by
    token string for determinism); every other token becomes ``<unk>``
    at train AND score time, so the model is closed over a bounded key
    space. Counts are exact integers (oracle-friendly); only the final
    log scoring is float."""
    uni_all = (
        docs.select(F.explode(tokens(text_col)).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    vocab = (
        uni_all.orderBy(F.desc("c"), "w").limit(max_vocab).select("w")
    )
    # map OOV → UNK once, at the array level, then derive both tables
    # from the SAME mapped arrays (train/score symmetry)
    mapped = _with_mapped_array(docs, text_col, vocab)
    uni = (
        mapped.select(F.explode("_mtoks").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c_w"))
    )
    big = (
        mapped.select(F.explode(_bigram_pairs()).alias("p"))
        .select(F.col("p.v").alias("v"), F.col("p.w").alias("w"))
        .groupBy("v", "w")
        .agg(F.count(F.lit(1)).alias("c_vw"))
    )
    ctx = big.groupBy("v").agg(F.sum("c_vw").alias("c_v"))
    totals = uni.agg(
        F.sum("c_w").alias("t"), F.count(F.lit(1)).alias("vs")
    ).collect()[0]
    return BigramLM(
        unigrams=uni,
        bigrams=big,
        context_totals=ctx,
        total_tokens=int(totals["t"]),
        # +1 so UNK keeps probability mass even when never seen in train
        vocab_size=int(totals["vs"]) + (
            0 if uni.where(F.col("w") == UNK).count() else 1
        ),
        lam=lam,
    )


def _with_mapped_array(docs: DataFrame, text_col: str, vocab: DataFrame):
    """docs + ``_mtoks`` array with OOV replaced by UNK (broadcast
    membership via a joined vocab array — vocabulary is bounded)."""
    vocab_arr = vocab.agg(
        F.array_sort(F.collect_set("w")).alias("_vocab")
    )
    return docs.crossJoin(F.broadcast(vocab_arr)).select(
        "*",
        F.transform(
            tokens(text_col),
            lambda t: F.when(
                F.array_contains(F.col("_vocab"), t), t
            ).otherwise(F.lit(UNK)),
        ).alias("_mtoks"),
    )


def _bigram_pairs():
    """(v, w) struct array over BOS-prefixed ``_mtoks``."""
    with_bos = F.concat(F.array(F.lit(BOS)), F.col("_mtoks"))
    n = F.size(with_bos)
    return F.zip_with(
        F.slice(with_bos, 1, n - 1),
        F.slice(with_bos, 2, n - 1),
        lambda v, w: F.struct(v.alias("v"), w.alias("w")),
    )


def score_docs(
    docs: DataFrame,
    lm: BigramLM,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_model: bool = True,
) -> DataFrame:
    """(id, n_scored, nll) — mean negative log p per token (lower =
    more natural). Empty docs get NULL nll. ``broadcast_model=False``
    switches the bigram join to shuffle (sort-merge) for models too big
    to broadcast."""
    vocab = lm.unigrams.select("w")
    mapped = _with_mapped_array(
        docs.select(id_col, text_col), text_col, vocab
    )
    pairs = mapped.select(
        F.col(id_col),
        F.explode(_bigram_pairs()).alias("p"),
    ).select(id_col, F.col("p.v").alias("v"), F.col("p.w").alias("w"))
    big = lm.bigrams
    ctx = lm.context_totals
    uni = lm.unigrams
    if broadcast_model:
        big, ctx, uni = F.broadcast(big), F.broadcast(ctx), F.broadcast(uni)
    scored = (
        pairs.join(big, ["v", "w"], "left")
        .join(ctx, "v", "left")
        .join(uni.withColumnRenamed("c_w", "_cw"), "w", "left")
    )
    p_big = F.coalesce("c_vw", F.lit(0)).cast("double") / F.coalesce(
        "c_v", F.lit(1)
    )
    p_uni = (F.coalesce("_cw", F.lit(0)) + 1.0) / (
        lm.total_tokens + lm.vocab_size
    )
    p = F.lit(lm.lam) * p_big + F.lit(1.0 - lm.lam) * p_uni
    return (
        scored.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_scored"),
            (-F.avg(F.log(p))).alias("nll"),
        )
    )


def perplexity_filter(
    docs: DataFrame,
    lm: BigramLM,
    max_nll: float,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Keep documents whose mean token NLL is ≤ ``max_nll`` — the CCNet
    head/middle cut. Docs with no scoreable tokens are dropped."""
    kept = score_docs(docs, lm, id_col, text_col).where(
        F.col("nll") <= max_nll
    )
    return docs.join(kept.select(id_col), id_col, "semi")
