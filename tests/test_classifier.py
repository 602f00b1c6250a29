"""Hashed n-gram logistic regression: feature structure, separable
training with generalization, and the exact tie-corrected AUC vs a
naive reference."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from etl_sentinel_imagery_spark.operators.classifier import (
    auc,
    hash_features,
    score_logreg,
    train_logreg,
)

DIM = 1 << 12

POS_WORDS = "clear concise accurate thorough insightful careful".split()
NEG_WORDS = "spam clickbait scam lottery winner pills".split()


def _corpus(spark, n=120, seed=3):
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        pos = i % 2 == 0
        vocab = POS_WORDS if pos else NEG_WORDS
        words = [vocab[int(j)] for j in rng.integers(0, len(vocab), 12)]
        rows.append((i, " ".join(words), 1 if pos else 0))
    return spark.createDataFrame(rows, "doc_id bigint, text string, label int")


def test_feature_structure(spark):
    docs = spark.createDataFrame(
        [(1, "a b a"), (2, ""), (3, "solo")], "doc_id bigint, text string"
    )
    rows = {r["doc_id"]: r for r in hash_features(docs, dim=DIM).collect()}
    # doc 1: grams = a,b,a + "a b","b a" -> 5 instances over <=4 buckets
    assert sum(rows[1]["cnt"]) == 5.0
    assert rows[1]["idx"] == sorted(rows[1]["idx"])
    assert all(0 <= i < DIM for i in rows[1]["idx"])
    # single token: 1 unigram, no bigrams
    assert sum(rows[3]["cnt"]) == 1.0
    # empty doc has no feature row (explode drops it)
    assert 2 not in rows


def test_training_separates_and_generalizes(spark):
    train = _corpus(spark, 120, seed=3)
    feats = hash_features(train, dim=DIM)
    labels = train.select("doc_id", "label")
    w = train_logreg(feats, labels, dim=DIM, n_iter=40, lr=2.0)
    assert w.shape == (DIM + 1,)
    scored = score_logreg(feats, w).join(labels, "doc_id")
    assert auc(scored) == 1.0  # linearly separable vocabularies
    # held-out docs from the same distributions score on the right side
    held = _corpus(spark, 40, seed=99)
    hs = score_logreg(hash_features(held, dim=DIM), w).join(
        held.select("doc_id", "label"), "doc_id"
    )
    got = hs.collect()
    for r in got:
        if r["label"] == 1:
            assert r["quality_score"] > 0.5, r
        else:
            assert r["quality_score"] < 0.5, r


def test_auc_matches_naive_reference_with_ties(spark):
    rng = np.random.default_rng(11)
    scores = np.round(rng.uniform(0, 1, 300), 2)  # coarse -> many ties
    labels = (rng.uniform(0, 1, 300) < scores).astype(int)
    if labels.sum() in (0, 300):
        labels[0] = 1 - labels[0]
    df = spark.createDataFrame(
        [(float(s), int(y)) for s, y in zip(scores, labels)],
        "quality_score double, label int",
    )
    got = auc(df)
    # naive O(n^2) Mann-Whitney with half-credit ties
    pos = scores[labels == 1]
    neg = scores[labels == 0]
    num = sum(
        1.0 if p > q else (0.5 if p == q else 0.0)
        for p in pos
        for q in neg
    )
    want = num / (len(pos) * len(neg))
    assert got == pytest.approx(want, abs=1e-12)
