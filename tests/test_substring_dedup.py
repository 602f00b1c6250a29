"""Exact substring dedup: duplicated k-gram spans merge into maximal
intervals, clean_text drops exactly the covered tokens, unique text
survives untouched."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_sentinel_imagery_spark.operators.substring_dedup import (
    duplicated_span_table,
    flagged_occurrences,
)

BOILER = "the quick brown fox jumps over the lazy dog again"  # 10 tokens


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_shared_passage_flagged_in_both_docs(spark):
    """A 9-token passage shared by two docs is one maximal span in each,
    at its own offset; surrounding unique text is kept."""
    d = _docs(
        spark,
        [
            (1, f"alpha beta {BOILER} gamma delta"),
            (2, f"unrelated opening words here {BOILER}"),
            (3, "entirely unique text with no repeats at all ok"),
        ],
    )
    out = {
        r["doc_id"]: r
        for r in duplicated_span_table(d, "doc_id", "text", k=4).collect()
    }
    # doc 1: tokens 3..12 covered (1-based), doc 2: tokens 5..14
    assert [(s["lo"], s["hi"]) for s in out[1]["dup_spans"]] == [(3, 12)]
    assert [(s["lo"], s["hi"]) for s in out[2]["dup_spans"]] == [(5, 14)]
    assert out[1]["clean_text"] == "alpha beta gamma delta"
    assert out[2]["clean_text"] == "unrelated opening words here"
    assert out[1]["dup_token_count"] == 10
    assert out[3]["dup_spans"] == []
    assert out[3]["n_dup_spans"] == 0
    assert out[3]["clean_text"] == out[3]["text"]


def test_within_doc_repetition_counts(spark):
    """A doc repeating its own k-gram is boilerplate too — both copies
    flagged even though no other doc shares them."""
    d = _docs(
        spark,
        [
            (1, "x1 x2 x3 x4 middle words go here x1 x2 x3 x4"),
            (2, "completely different other document body text"),
        ],
    )
    out = {
        r["doc_id"]: r
        for r in duplicated_span_table(d, "doc_id", "text", k=4).collect()
    }
    assert [(s["lo"], s["hi"]) for s in out[1]["dup_spans"]] == [
        (1, 4),
        (9, 12),
    ]
    assert out[1]["clean_text"] == "middle words go here"


def test_overlapping_grams_merge_into_one_maximal_span(spark):
    """A duplicated passage longer than k yields a run of overlapping
    flagged k-grams that must merge into ONE maximal interval."""
    shared = "s1 s2 s3 s4 s5 s6 s7"
    d = _docs(spark, [(1, f"a b {shared}"), (2, f"{shared} z")])
    out = {
        r["doc_id"]: r
        for r in duplicated_span_table(d, "doc_id", "text", k=3).collect()
    }
    assert [(s["lo"], s["hi"]) for s in out[1]["dup_spans"]] == [(3, 9)]
    assert [(s["lo"], s["hi"]) for s in out[2]["dup_spans"]] == [(1, 7)]
    # occurrence-level view: 5 flagged window starts per doc (7-3+1)
    occ = flagged_occurrences(d, "doc_id", "text", k=3)
    assert occ.groupBy("doc_id").count().orderBy("doc_id").rdd.map(
        tuple
    ).collect() == [(1, 5), (2, 5)]


def test_short_and_empty_docs_are_clean(spark):
    d = _docs(spark, [(1, "one two"), (2, ""), (3, "one two")])
    out = {
        r["doc_id"]: r
        for r in duplicated_span_table(d, "doc_id", "text", k=4).collect()
    }
    # docs 1 and 3 are exact dups but shorter than k — invisible at this
    # resolution (document-level exact dedup owns that case)
    for i in (1, 2, 3):
        assert out[i]["n_dup_spans"] == 0
        assert out[i]["clean_text"] == out[i]["text"]


def test_fully_duplicated_doc_cleans_to_empty(spark):
    d = _docs(spark, [(1, BOILER), (2, BOILER)])
    out = duplicated_span_table(d, "doc_id", "text", k=4).collect()
    for r in out:
        assert r["clean_text"] == ""
        assert r["dup_token_count"] == 10
        assert [(s["lo"], s["hi"]) for s in r["dup_spans"]] == [(1, 10)]


def test_min_count_threshold(spark):
    """min_count=3 demands three corpus-wide occurrences."""
    d = _docs(
        spark,
        [
            (1, f"{BOILER} unique tail one"),
            (2, f"{BOILER} other middle part"),
            (3, "no shared content in this document at all really"),
        ],
    )
    out2 = {
        r["doc_id"]: r["n_dup_spans"]
        for r in duplicated_span_table(
            d, "doc_id", "text", k=4, min_count=3
        ).collect()
    }
    assert out2 == {1: 0, 2: 0, 3: 0}


def test_underscore_tokens_do_not_collide(spark):
    """['a','b_c','d',...] and ['a_b','c','d',...] must NOT alias: the
    gram key joins tokens with a space (which cannot occur inside a
    whitespace-split token), not '_'."""
    d = _docs(
        spark,
        [
            (1, "a b_c d e f"),
            (2, "a_b c d e f"),
        ],
    )
    out = {
        r["doc_id"]: r["n_dup_spans"]
        for r in duplicated_span_table(d, "doc_id", "text", k=4).collect()
    }
    assert out == {1: 0, 2: 0}


def test_keep_one_lowest_copy_survives(spark):
    """keep_one=True (the Lee et al. keep-one-copy deployment): the
    lexicographically-first (doc_id, start) copy of a shared passage
    stays unflagged — its clean_text keeps the passage — while every
    other copy is stripped exactly as before."""
    d = _docs(
        spark,
        [
            (1, f"alpha beta {BOILER} gamma delta"),
            (2, f"unrelated opening words here {BOILER}"),
            (3, f"{BOILER} trailing tail tokens"),
        ],
    )
    out = {
        r["doc_id"]: r
        for r in duplicated_span_table(
            d, "doc_id", "text", k=4, keep_one=True
        ).collect()
    }
    # doc 1 holds the min (doc_id, start) occurrence of every gram of
    # the passage -> fully unflagged, survives verbatim
    assert out[1]["dup_spans"] == []
    assert out[1]["clean_text"] == out[1]["text"]
    # the other copies are stripped
    assert [(s["lo"], s["hi"]) for s in out[2]["dup_spans"]] == [(5, 14)]
    assert out[2]["clean_text"] == "unrelated opening words here"
    assert [(s["lo"], s["hi"]) for s in out[3]["dup_spans"]] == [(1, 10)]
    assert out[3]["clean_text"] == "trailing tail tokens"


def test_keep_one_within_doc_keeps_first_occurrence(spark):
    """Within-document repetition under keep_one: the FIRST occurrence
    (min start) survives, the later copy is stripped."""
    d = _docs(
        spark,
        [
            (1, "x1 x2 x3 x4 middle words go here x1 x2 x3 x4"),
            (2, "completely different other document body text"),
        ],
    )
    out = {
        r["doc_id"]: r
        for r in duplicated_span_table(
            d, "doc_id", "text", k=4, keep_one=True
        ).collect()
    }
    assert [(s["lo"], s["hi"]) for s in out[1]["dup_spans"]] == [(9, 12)]
    assert out[1]["clean_text"] == "x1 x2 x3 x4 middle words go here"
    assert out[2]["dup_spans"] == []


def test_keep_one_flag_set_is_all_minus_canonical(spark):
    """flagged_occurrences(keep_one=True) equals the default flagged set
    minus exactly one (the min (id, start)) occurrence per gram."""
    d = _docs(
        spark,
        [
            (1, f"alpha beta {BOILER}"),
            (2, f"{BOILER} something else entirely"),
            (3, f"prefix words {BOILER} suffix"),
        ],
    )
    all_f = flagged_occurrences(d, "doc_id", "text", k=4).collect()
    k1_f = flagged_occurrences(
        d, "doc_id", "text", k=4, keep_one=True
    ).collect()
    by_gram_all: dict = {}
    for r in all_f:
        by_gram_all.setdefault(r["gram"], set()).add(
            (r["doc_id"], r["start"])
        )
    by_gram_k1: dict = {}
    for r in k1_f:
        by_gram_k1.setdefault(r["gram"], set()).add((r["doc_id"], r["start"]))
    for gram, occs in by_gram_all.items():
        assert by_gram_k1.get(gram, set()) == occs - {min(occs)}


def test_dual_table_equals_two_separate_tables(spark):
    """duplicated_span_table_dual must be row-identical to running the
    all-copies and keep-one tables separately — on a corpus exercising
    cross-doc shares, within-doc repeats, clean docs, and empty text."""
    from etl_sentinel_imagery_spark.operators.substring_dedup import (
        duplicated_span_table_dual,
    )

    d = _docs(
        spark,
        [
            (1, f"alpha beta {BOILER} gamma delta"),
            (2, f"unrelated opening words here {BOILER}"),
            (3, f"{BOILER} trailing tail tokens"),
            (4, "x1 x2 x3 x4 middle words go here x1 x2 x3 x4"),
            (5, "entirely unique text with no repeats at all ok"),
            (6, ""),
        ],
    )
    dual = {
        r["doc_id"]: r
        for r in duplicated_span_table_dual(
            d, "doc_id", "text", k=4, k1_clean_text=True
        ).collect()
    }
    sep_all = {
        r["doc_id"]: r
        for r in duplicated_span_table(d, "doc_id", "text", k=4).collect()
    }
    sep_k1 = {
        r["doc_id"]: r
        for r in duplicated_span_table(
            d, "doc_id", "text", k=4, keep_one=True
        ).collect()
    }
    assert set(dual) == set(sep_all) == set(sep_k1)
    for i in dual:
        assert dual[i]["dup_spans"] == sep_all[i]["dup_spans"], i
        assert dual[i]["n_dup_spans"] == sep_all[i]["n_dup_spans"], i
        assert dual[i]["dup_token_count"] == sep_all[i]["dup_token_count"], i
        assert dual[i]["clean_text"] == sep_all[i]["clean_text"], i
        assert dual[i]["k1_dup_spans"] == sep_k1[i]["dup_spans"], i
        assert dual[i]["k1_n_dup_spans"] == sep_k1[i]["n_dup_spans"], i
        assert dual[i]["k1_dup_token_count"] == sep_k1[i]["dup_token_count"], i
        assert dual[i]["k1_clean_text"] == sep_k1[i]["clean_text"], i
