"""Unigram-LM tokenizer: lossless Viterbi segmentation, frequent words
stay whole, vocab budget respected with chars never pruned, Spark
encode == driver encode, determinism."""

from __future__ import annotations

import pytest

from etl_sentinel_imagery_spark.operators.unigram_lm import (
    train_unigram,
    train_unigram_distributed,
    unigram_encode,
    unigram_encode_word,
)

CORPUS = (
    ("the", 50),
    ("cat", 20),
    ("cats", 10),
    ("catalog", 5),
    ("dog", 18),
    ("dogs", 9),
    ("doghouse", 4),
    ("house", 12),
    ("unrelated", 2),
    ("thecat", 3),
)


def test_lossless_and_frequent_words_whole():
    model = train_unigram(CORPUS, vocab_size=40)
    for w, _ in CORPUS:
        pieces = unigram_encode_word(w, model)
        assert "".join(pieces) == w  # lossless always
    # the most frequent words earn whole-word pieces
    assert unigram_encode_word("the", model) == ["the"]
    assert unigram_encode_word("cat", model) == ["cat"]
    # an UNSEEN word still encodes losslessly (falls back to sub-pieces)
    assert "".join(unigram_encode_word("catdog", model)) == "catdog"
    assert "".join(unigram_encode_word("zzzqqq", model)) == "zzzqqq"


def test_vocab_budget_and_chars_survive():
    model = train_unigram(CORPUS, vocab_size=20)
    chars = {c for w, _ in CORPUS for c in w}
    assert chars <= set(model)  # single chars never pruned
    assert len(model) <= max(20, len(chars)) + len(chars)
    tight = train_unigram(CORPUS, vocab_size=1)
    # floor is the char set: everything still encodable
    assert chars <= set(tight)
    for w, _ in CORPUS:
        assert "".join(unigram_encode_word(w, tight)) == w


def test_deterministic():
    a = train_unigram(CORPUS, vocab_size=30)
    b = train_unigram(list(CORPUS), vocab_size=30)
    assert a == b


def test_spark_encode_matches_driver(spark):
    docs = spark.createDataFrame(
        [
            (1, "the cat cats catalog"),
            (2, "dog dogs doghouse house THE CAT"),
            (3, ""),
        ],
        "doc_id bigint, text string",
    )
    model = train_unigram_distributed(docs, vocab_size=40)
    rows = {r["doc_id"]: r for r in unigram_encode(docs, model).collect()}
    for doc_id, text in ((1, "the cat cats catalog"), (2, "dog dogs doghouse house the cat")):
        want = []
        for w in text.split(" "):
            if w:
                want.extend(unigram_encode_word(w, model))
        assert rows[doc_id]["pieces"] == want
        assert rows[doc_id]["n_pieces"] == len(want)
    assert rows[3]["pieces"] == [] and rows[3]["n_pieces"] == 0


def test_segmentation_prefers_probable_pieces():
    """'thecat' should split into the two high-probability words rather
    than survive as its own low-count piece after pruning."""
    model = train_unigram(CORPUS, vocab_size=15)
    if "thecat" not in model:
        assert unigram_encode_word("thecat", model) == ["the", "cat"]
