from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_sentinel_imagery_spark.operators.line_dedup import (
    duplicated_line_stats,
    line_table,
    remove_duplicated_lines,
)

BOILER = "this exact navigation banner repeats on every page"
BOILER2 = "subscribe to our newsletter for updates today"


@pytest.fixture()
def docs(spark):
    rows = [
        (1, f"{BOILER}\nunique opening paragraph one\n{BOILER2}"),
        (2, f"{BOILER}\nunique second body text here\n{BOILER2}"),
        (3, f"unique third document alone\n{BOILER}"),
        (4, "short\nshort"),  # < min_chars: never dedup-eligible
        (5, BOILER),  # whole doc is one duplicated line
        (6, ""),  # empty document: one empty line, kept
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def brute(rows, min_count=2, min_chars=20, keep_first=False):
    occ = {}
    for did, text in rows:
        for i, ln in enumerate(text.split("\n"), start=1):
            if len(ln) >= min_chars:
                occ.setdefault(ln, []).append((did, i))
    dup = {ln for ln, o in occ.items() if len(o) >= min_count}
    first = {ln: min(o) for ln, o in occ.items() if ln in dup}
    out = {}
    for did, text in rows:
        kept = []
        for i, ln in enumerate(text.split("\n"), start=1):
            drop = ln in dup and not (
                keep_first and first[ln] == (did, i)
            )
            if not drop:
                kept.append(ln)
        out[did] = "\n".join(kept)
    return out


def test_line_table_order_and_numbering(spark, docs):
    got = (
        line_table(docs)
        .where(F.col("doc_id") == 1)
        .orderBy("line_no")
        .collect()
    )
    assert [r["line_no"] for r in got] == [1, 2, 3]
    assert got[0]["line"] == BOILER
    assert got[2]["line"] == BOILER2


def test_stats_both_deployments(spark, docs):
    out = {
        r["doc_id"]: r
        for r in duplicated_line_stats(docs, min_chars=20).collect()
    }
    assert len(out) == 6  # every doc keeps its row
    # doc 1 has both boilerplate lines; keep-first retains them (it is
    # the globally first occurrence of each)
    assert out[1]["n_dup_lines"] == 2
    assert out[1]["k1_n_dup_lines"] == 0
    assert out[1]["line_clean_text"] == "unique opening paragraph one"
    assert (
        out[1]["k1_line_clean_text"]
        == f"{BOILER}\nunique opening paragraph one\n{BOILER2}"
    )
    # doc 2: same two dup lines, but NOT first occurrences
    assert out[2]["n_dup_lines"] == 2
    assert out[2]["k1_n_dup_lines"] == 2
    assert out[2]["line_clean_text"] == "unique second body text here"
    # doc 4: short lines repeat but are below min_chars
    assert out[4]["n_dup_lines"] == 0
    assert out[4]["line_clean_text"] == "short\nshort"
    # doc 5 collapses to empty, row survives
    assert out[5]["line_clean_text"] == ""
    assert out[5]["n_lines"] == 1
    # empty doc passes through untouched
    assert out[6]["line_clean_text"] == ""
    assert out[6]["n_dup_lines"] == 0


@pytest.mark.parametrize("keep_first", [False, True])
def test_matches_bruteforce(spark, docs, keep_first):
    rows = [(r["doc_id"], r["text"]) for r in docs.collect()]
    want = brute(rows, keep_first=keep_first)
    got = {
        r["doc_id"]: r["text"]
        for r in remove_duplicated_lines(
            docs, keep_first=keep_first
        ).collect()
    }
    assert got == want


def test_remove_keeps_other_columns(spark):
    df = spark.createDataFrame(
        [(1, "x", f"{BOILER}\nkeep me longer line"), (2, "y", BOILER)],
        ["doc_id", "src", "text"],
    )
    out = remove_duplicated_lines(df).orderBy("doc_id").collect()
    assert [r["src"] for r in out] == ["x", "y"]
    assert out[0]["text"] == "keep me longer line"
    assert out[0]["n_dup_lines_removed"] == 1
    assert out[1]["text"] == ""


def test_custom_delimiter(spark):
    df = spark.createDataFrame(
        [
            (1, f"{BOILER}. another sentence entirely here"),
            (2, f"{BOILER}. different trailing sentence text"),
        ],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: r["line_clean_text"]
        for r in duplicated_line_stats(df, delim=". ").collect()
    }
    assert out[1] == "another sentence entirely here"
    assert out[2] == "different trailing sentence text"


def test_line_dedup_plan_shape(spark, docs):
    """The scale claims, asserted on the physical plan: the frequency
    aggregation partial-aggregates map-side, the mark join is
    sort-merge (never a broadcast/hash build of the corpus-sized dup
    table), and line explosion is a Generate."""
    plan = duplicated_line_stats(docs)._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "BroadcastHashJoin" not in plan
    assert "ShuffledHashJoin" not in plan
    assert "partial_count" in plan
    assert "Generate" in plan


def test_null_text_docs_survive(spark):
    """Docs with NULL text have no line rows (posexplode of NULL) and
    hence no stats row — remove_duplicated_lines must keep them (left
    join + coalesce, ADVICE r4), not silently drop them."""
    from etl_sentinel_imagery_spark.operators.line_dedup import (
        remove_duplicated_lines,
    )

    boiler = "this exact boilerplate sentence repeats across documents"
    docs = spark.createDataFrame(
        [
            (1, boiler + "\nunique first body line of doc one"),
            (2, boiler + "\nunique second body line of doc two"),
            (3, None),
            (4, ""),
        ],
        ["doc_id", "text"],
    )
    for keep_first in (False, True):
        out = remove_duplicated_lines(
            docs, min_count=2, min_chars=10, keep_first=keep_first
        )
        rows = {r["doc_id"]: r for r in out.collect()}
        assert set(rows) == {1, 2, 3, 4}, "one row per input row, always"
        assert rows[3]["text"] is None
        assert rows[3]["n_dup_lines_removed"] == 0
        assert rows[4]["n_dup_lines_removed"] == 0
        # the dedup itself still works on the non-NULL docs
        expect_in_1 = 1 if keep_first else 0
        assert rows[1]["text"].count(boiler) == expect_in_1
        assert rows[2]["text"].count(boiler) == 0
