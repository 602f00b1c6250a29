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

from pyspark.sql import Column, DataFrame
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
    # The model tables are all vocab-bounded (vocab ≤ max_vocab rows,
    # uni ≤ V+1, big ≤ observed bigrams ≤ (V+1)², ctx ≤ V+1) — tiny by
    # construction while their LINEAGE is a full corpus pass each.
    # Every downstream consumer (the two vocab joins inside _map_oov,
    # the three-way model join of score_docs/score_doc_counts/
    # model_prob_rational) builds a broadcast from them, and without a
    # materialization barrier each broadcast build re-runs the whole
    # tokenize→explode→groupBy training pipeline: the round-12 plan
    # audit counted 56 parquet scans / 170 Exchanges in the sketch+LM
    # battery from exactly this. localCheckpoint pins each table once;
    # training is 3 corpus passes (vocab, uni, big) and model joins
    # read checkpointed rows.
    vocab = (
        uni_all.orderBy(F.desc("c"), "w").limit(max_vocab).select("w")
    ).localCheckpoint(eager=True)
    # map OOV → UNK by joining exploded rows against the (bounded,
    # broadcast) vocab table — O(1) per token via the hash join, not an
    # O(max_vocab) array_contains scan inside a transform (review
    # finding: the scan made train/score cost corpus_tokens × V).
    # Mapping is pointwise, so pairing raw tokens FIRST and mapping the
    # two pair slots afterwards equals mapping-then-pairing.
    pairs = docs.select(
        F.explode(_bigram_pairs(tokens(text_col))).alias("p")
    ).select(F.col("p.v").alias("v"), F.col("p.w").alias("w"))
    big = (
        _map_oov(pairs, ["v", "w"], vocab)
        .groupBy("v", "w")
        .agg(F.count(F.lit(1)).alias("c_vw"))
    ).localCheckpoint(eager=True)
    # the mapped-unigram table DERIVES from the bigram table instead of
    # paying its own corpus pass (round 12): BOS is prepended before
    # pairing, so every token of every doc appears exactly once in the
    # w slot — c_w = Σ_v c_vw, mapped identically (the w slot went
    # through the same OOV join). Training drops from 3 corpus passes
    # to 2 (vocab, bigrams); the aggregate runs over the checkpointed
    # vocab-bounded bigram table, not the corpus.
    uni = (
        big.groupBy("w").agg(F.sum("c_vw").alias("c_w"))
    ).localCheckpoint(eager=True)
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


def _map_oov(df: DataFrame, cols: list[str], vocab: DataFrame) -> DataFrame:
    """Replace every out-of-vocabulary value in ``cols`` with UNK via a
    broadcast hash join per column (BOS passes through — it is a
    sentinel, not a vocabulary member)."""
    out = df
    for c in cols:
        flag = f"_in_{c}"
        out = out.join(
            F.broadcast(
                vocab.select(F.col("w").alias(c), F.lit(True).alias(flag))
            ),
            c,
            "left",
        ).withColumn(
            c,
            F.when(
                (F.col(c) == BOS) | F.col(flag).isNotNull(), F.col(c)
            ).otherwise(F.lit(UNK)),
        ).drop(flag)
    return out


def _bigram_pairs(arr: Column) -> Column:
    """(v, w) struct array over the BOS-prefixed token array."""
    with_bos = F.concat(F.array(F.lit(BOS)), arr)
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
    more natural). Tokenless docs are ABSENT from the output (explode
    yields no pair rows for them — callers wanting a row per doc left-
    join this result back). ``broadcast_model=False`` switches the
    bigram join to shuffle (sort-merge) for models too big to
    broadcast."""
    vocab = lm.unigrams.select("w")
    pairs = _map_oov(
        docs.select(
            F.col(id_col),
            F.explode(_bigram_pairs(tokens(text_col))).alias("p"),
        ).select(id_col, F.col("p.v").alias("v"), F.col("p.w").alias("w")),
        ["v", "w"],
        vocab,
    )
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


def score_doc_counts(
    docs: DataFrame,
    lm: BigramLM,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_model: bool = True,
) -> DataFrame:
    """The INTEGER skeleton of :func:`score_docs` — per document the
    exact count sums its probability is computed from: ``n_scored``
    (bigram pairs), ``sum_c_vw`` / ``sum_c_v`` / ``sum_cw`` (model
    count mass the doc's pairs matched) and ``n_unk_w`` (OOV
    next-tokens). Same tokenization, BOS prefixing, OOV mapping and
    three-way model join as score_docs; only the final log arithmetic
    is absent — which is exactly why this facet sits under the strict
    DuckDB hash gate (round 11) while nll scores stay pytest-pinned
    (libm last-ulp variance, see module docstring). A hash-green row
    here proves the train→map→join→aggregate machinery end to end;
    the log curve on top is three lines of float."""
    vocab = lm.unigrams.select("w")
    pairs = _map_oov(
        docs.select(
            F.col(id_col),
            F.explode(_bigram_pairs(tokens(text_col))).alias("p"),
        ).select(id_col, F.col("p.v").alias("v"), F.col("p.w").alias("w")),
        ["v", "w"],
        vocab,
    )
    big, ctx, uni = lm.bigrams, lm.context_totals, lm.unigrams
    if broadcast_model:
        big, ctx, uni = F.broadcast(big), F.broadcast(ctx), F.broadcast(uni)
    scored = (
        pairs.join(big, ["v", "w"], "left")
        .join(ctx, "v", "left")
        .join(uni.withColumnRenamed("c_w", "_cw"), "w", "left")
    )
    zero = F.lit(0).cast("long")
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_scored"),
        F.sum(F.coalesce("c_vw", zero)).cast("long").alias("sum_c_vw"),
        F.sum(F.coalesce("c_v", zero)).cast("long").alias("sum_c_v"),
        F.sum(F.coalesce("_cw", zero)).cast("long").alias("sum_cw"),
        F.sum(
            F.when(F.col("w") == UNK, 1).otherwise(0)
        ).cast("long").alias("n_unk_w"),
    )


def model_prob_rational(
    docs: DataFrame,
    lm: BigramLM,
    text_col: str = "text",
    broadcast_model: bool = True,
) -> DataFrame:
    """The interpolated probability CURVE as exact BIGINT rationals —
    ``(v, w, p_num, p_den)`` for every DISTINCT post-OOV bigram
    occurring in ``docs`` (round-11 verdict #6 / ROADMAP #4: the one
    pytest-only piece of the CCNet scorer joins the hash gate).

    With λ = L/D (``lm.lam`` rationalized exactly from its decimal
    literal), the scorer's
    ``p(w|v) = λ·c_vw/c_v + (1−λ)·(c_w+1)/(T+V)`` is the rational

        p_num = L·c_vw·(T+V) + (D−L)·c_v·(c_w+1)
        p_den = D·c_v·(T+V)

    — pure BIGINT arithmetic (no gcd reduction needed: both engines
    compute the SAME canonical num/den), with the same coalesce
    semantics as :func:`score_docs` (missing bigram → c_vw=0, unseen
    context → c_v=1, OOV unigram → c_w=0). ``score_docs``'s float
    ``log(p)`` equals ``log(p_num/p_den)`` up to libm rounding —
    pinned in tests/test_lm_score.py. Magnitude: num ≤ D·T·(T+V),
    ~2^62 headroom until T+V nears 2^30 tokens per trained model —
    models are vocab-bounded by construction, not corpus-sized.

    Scale shape: the distinct-pair set is bounded by (V+1)²; model
    tables broadcast (or sort-merge when ``broadcast_model=False``);
    nothing corpus-sized leaves the executors."""
    from fractions import Fraction

    frac = Fraction(str(lm.lam))
    lnum, lden = frac.numerator, frac.denominator
    tv = lm.total_tokens + lm.vocab_size
    vocab = lm.unigrams.select("w")
    pairs = _map_oov(
        docs.select(
            F.explode(_bigram_pairs(tokens(text_col))).alias("p")
        ).select(F.col("p.v").alias("v"), F.col("p.w").alias("w")),
        ["v", "w"],
        vocab,
    ).distinct()
    big, ctx, uni = lm.bigrams, lm.context_totals, lm.unigrams
    if broadcast_model:
        big, ctx, uni = F.broadcast(big), F.broadcast(ctx), F.broadcast(uni)
    j = (
        pairs.join(big, ["v", "w"], "left")
        .join(ctx, "v", "left")
        .join(uni.withColumnRenamed("c_w", "_cw"), "w", "left")
    )
    c_vw = F.coalesce("c_vw", F.lit(0)).cast("long")
    c_v = F.coalesce("c_v", F.lit(1)).cast("long")
    c_w = F.coalesce("_cw", F.lit(0)).cast("long")
    num = (
        F.lit(lnum) * c_vw * F.lit(tv)
        + F.lit(lden - lnum) * c_v * (c_w + F.lit(1))
    ).cast("long")
    den = (F.lit(lden) * c_v * F.lit(tv)).cast("long")
    return j.select("v", "w", num.alias("p_num"), den.alias("p_den"))


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
