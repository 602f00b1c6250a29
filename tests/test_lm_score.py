"""Bigram LM quality scoring vs an independent Python reference;
fluent vs gibberish separation; vocabulary-cap OOV semantics."""

from __future__ import annotations

import math

from etl_sentinel_imagery_spark.operators.lm_score import (
    BOS,
    UNK,
    perplexity_filter,
    score_docs,
    train_bigram_lm,
)

TRAIN = [
    (1, "the cat sat on the mat"),
    (2, "the dog sat on the rug"),
    (3, "a cat and a dog play on the mat"),
    (4, "the cat and the dog sat together"),
]


def _ref_lm(train_texts, max_vocab=50_000, lam=0.8):
    """From-scratch reference: counts + interpolated estimate."""
    uni_raw: dict[str, int] = {}
    for t in train_texts:
        for w in t.split():
            uni_raw[w] = uni_raw.get(w, 0) + 1
    vocab = {
        w
        for w, _ in sorted(uni_raw.items(), key=lambda kv: (-kv[1], kv[0]))[
            :max_vocab
        ]
    }
    m = lambda w: w if w in vocab else UNK
    uni: dict[str, int] = {}
    big: dict[tuple, int] = {}
    ctx: dict[str, int] = {}
    for t in train_texts:
        toks = [m(w) for w in t.split()]
        for w in toks:
            uni[w] = uni.get(w, 0) + 1
        for v, w in zip([BOS] + toks[:-1], toks):
            big[(v, w)] = big.get((v, w), 0) + 1
            ctx[v] = ctx.get(v, 0) + 1
    total = sum(uni.values())
    vs = len(uni) + (0 if UNK in uni else 1)

    def score(text, ):
        toks = [m(w) for w in text.split()]
        if not toks:
            return None
        nll = 0.0
        for v, w in zip([BOS] + toks[:-1], toks):
            p_b = big.get((v, w), 0) / ctx.get(v, 1)
            p_u = (uni.get(w, 0) + 1) / (total + vs)
            nll -= math.log(lam * p_b + (1 - lam) * p_u)
        return nll / len(toks)

    return score


def test_matches_reference_scores(spark):
    docs = spark.createDataFrame(TRAIN, "doc_id bigint, text string")
    lm = train_bigram_lm(docs)
    ref = _ref_lm([t for _, t in TRAIN])
    got = {r["doc_id"]: r for r in score_docs(docs, lm).collect()}
    for d, t in TRAIN:
        assert got[d]["n_scored"] == len(t.split())
        assert abs(got[d]["nll"] - ref(t)) < 1e-12


def test_fluent_beats_gibberish_and_shuffled(spark):
    train = spark.createDataFrame(TRAIN, "doc_id bigint, text string")
    lm = train_bigram_lm(train)
    probe = spark.createDataFrame(
        [
            (10, "the cat sat on the rug"),          # fluent, in-domain
            (11, "mat the on sat cat the"),          # shuffled word salad
            (12, "zxq qqv bnmp wrt klx vvx"),        # gibberish OOV
        ],
        "doc_id bigint, text string",
    )
    s = {r["doc_id"]: r["nll"] for r in score_docs(probe, lm).collect()}
    assert s[10] < s[11] < s[12]


def test_vocab_cap_maps_tail_to_unk(spark):
    docs = spark.createDataFrame(TRAIN, "doc_id bigint, text string")
    lm = train_bigram_lm(docs, max_vocab=3)
    vocab = {r["w"] for r in lm.unigrams.collect()}
    # top-3 by frequency: 'the' (7), then ties broken by string
    assert UNK in vocab and "the" in vocab and len(vocab) == 4
    ref = _ref_lm([t for _, t in TRAIN], max_vocab=3)
    got = {r["doc_id"]: r["nll"] for r in score_docs(docs, lm).collect()}
    for d, t in TRAIN:
        assert abs(got[d] - ref(t)) < 1e-12


def test_perplexity_filter_keeps_fluent(spark):
    train = spark.createDataFrame(TRAIN, "doc_id bigint, text string")
    lm = train_bigram_lm(train)
    probe = spark.createDataFrame(
        [(10, "the cat sat on the mat"), (12, "zxq qqv bnmp wrt klx")],
        "doc_id bigint, text string",
    )
    s = {r["doc_id"]: r["nll"] for r in score_docs(probe, lm).collect()}
    cut = (s[10] + s[12]) / 2
    kept = perplexity_filter(probe, lm, cut).collect()
    assert [r["doc_id"] for r in kept] == [10]


def test_shuffle_join_path_matches_broadcast(spark):
    docs = spark.createDataFrame(TRAIN, "doc_id bigint, text string")
    lm = train_bigram_lm(docs)
    a = {
        r["doc_id"]: (r["n_scored"], r["nll"])
        for r in score_docs(docs, lm, broadcast_model=True).collect()
    }
    b = {
        r["doc_id"]: (r["n_scored"], r["nll"])
        for r in score_docs(docs, lm, broadcast_model=False).collect()
    }
    assert a.keys() == b.keys()
    for d in a:
        assert a[d][0] == b[d][0]
        # join strategy changes the avg()'s partial-sum order → last-ulp
        # drift is expected, equality is semantic not bitwise here
        assert abs(a[d][1] - b[d][1]) < 1e-12


def test_rational_curve_matches_float_scorer(spark):
    """model_prob_rational (round-12: the full interpolated curve
    under exact BIGINT arithmetic) agrees with the float scorer: for
    every doc, -mean(log(p_num/p_den)) over its bigrams == score_docs
    nll to 1e-12; and every p is a valid probability (0 < p ≤ 1,
    positive denominators)."""
    from fractions import Fraction

    from etl_sentinel_imagery_spark.operators.lm_score import (
        model_prob_rational,
    )

    docs = spark.createDataFrame(TRAIN, "doc_id bigint, text string")
    lm = train_bigram_lm(docs)
    curve = {
        (r["v"], r["w"]): Fraction(r["p_num"], r["p_den"])
        for r in model_prob_rational(docs, lm).collect()
    }
    assert all(0 < p <= 1 for p in curve.values())
    ref = _ref_lm([t for _, t in TRAIN])
    got = {r["doc_id"]: r["nll"] for r in score_docs(docs, lm).collect()}
    # reconstruct each doc's nll from the rational curve alone
    uni = {r["w"] for r in lm.unigrams.collect()}
    m = lambda w: w if (w in uni or w == BOS) else UNK
    for d, t in TRAIN:
        toks = [m(w) for w in t.split()]
        nll = -sum(
            math.log(curve[(v, w)])
            for v, w in zip([BOS] + toks[:-1], toks)
        ) / len(toks)
        assert abs(nll - got[d]) < 1e-12
        assert abs(nll - ref(t)) < 1e-12
