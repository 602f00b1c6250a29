"""Exact substring-level deduplication — duplicated token-k-gram spans.

Document-level dedup (operators.dedup) removes whole near-identical
documents, but web corpora also repeat LONG PASSAGES inside otherwise
distinct documents (boilerplate, licenses, quoted articles). The
standard treatment (Lee et al. 2022, "Deduplicating Training Data Makes
Language Models Better") finds exact duplicated substrings of >= N
tokens corpus-wide and removes them. Their single-node tool builds a
suffix array; a suffix array is not a Spark shape — the distributed
equivalent at fixed resolution k is positional k-gram matching, which
this module implements with built-in expressions only:

1. every token position opens a k-gram (positions kept — NOT the
   distinct gram set MinHash uses, `functions.text.word_ngrams`);
2. one map-side-combinable groupBy counts each gram's corpus frequency
   (partial aggregation collapses repeats before the shuffle — the
   boilerplate mega-gram arrives at the reducer as per-partition
   partials, so a hot gram cannot straggle a task);
3. occurrences of grams with count >= min_count flow back via a
   sort-merge join on the gram string (the occurrence side is
   corpus-sized: broadcast/hash would OOM, sort-merge spills — same
   strategy argument as operators.dedup's band join);
4. per document, flagged start positions merge into MAXIMAL covered
   spans (interval union, then gaps-and-islands over covered token
   indices — a linear zip_with fold, no per-token membership scans);
5. `clean_text` drops every covered token (`array_except` on the
   position axis, O(n+m) hash set difference).

Any duplicated substring of length >= 2k-1 tokens is guaranteed to
contain a fully-flagged k-gram span; substrings shorter than k are
invisible. So k trades resolution against gram-table size exactly like
the suffix-array length threshold (Lee et al. use 50 BPE tokens).

Removal semantics: with ``keep_one=False`` (default) ALL occurrences
of a duplicated span are flagged, including the "first" copy — the
common "remove boilerplate everywhere" deployment. ``keep_one=True``
is the Lee-et-al keep-one-copy deployment: each gram elects its
canonical occurrence by global ``min(struct(id, start))`` — a field
folded into the SAME combinable frequency groupBy, so the election
costs no extra shuffle — and the canonical occurrence is left
unflagged, so the lexicographically-first copy of a duplicated passage
survives in ``clean_text``. The election is per-gram: if a gram also
appears in an unrelated lower-id context, a span's flags can split at
gram resolution (the fixed-resolution analog of Lee et al.'s
suffix-interval choice; deterministic either way).

Every step is restatable in ANSI SQL (window/group-by + list ops), so
the operator carries a full DuckDB oracle via the docs battery.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_sentinel_imagery_spark.functions.text import tokens


def positional_ngrams(
    docs: DataFrame, id_col: str, text_col: str, k: int
) -> DataFrame:
    """(id, start, gram) — one row per token position opening a k-gram;
    ``start`` is the 1-based token index.

    Tokenizes ONCE behind a repartition materialization barrier:
    projection collapse would otherwise inline the split into the
    per-position slice lambda and re-split the document at every
    position — O(n²) per doc (the chunk_documents hazard). The
    round-robin repartition doubles as explode-skew spreading: a giant
    doc's gram rows all originate from one input row."""
    par = docs.sparkSession.sparkContext.defaultParallelism
    tok_df = docs.select(
        F.col(id_col), tokens(F.col(text_col)).alias("_toks")
    ).repartition(par)
    toks = F.col("_toks")
    grams = F.when(
        F.size(toks) >= k,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (k - 1)),
            # single-space separator: tokens are whitespace-split, so a
            # space can never occur INSIDE a token — the join is
            # collision-free ('_' would alias ["a","b_c"] with ["a_b","c"])
            lambda i: F.concat_ws(" ", F.slice(toks, i, k)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return tok_df.select(
        F.col(id_col),
        F.posexplode(grams).alias("pos0", "gram"),
    ).select(id_col, (F.col("pos0") + 1).alias("start"), "gram")


def flagged_occurrences(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 8,
    min_count: int = 2,
    keep_one: bool = False,
) -> DataFrame:
    """(id, start, gram, gram_count) for every k-gram occurrence whose
    gram appears >= min_count times CORPUS-WIDE (within-doc repeats
    count: a doc that repeats its own paragraph is boilerplate too).

    ``keep_one=True`` drops each gram's canonical occurrence — the
    global min over (id, start) — from the flagged set (see module
    docstring); min(struct) rides in the same combinable groupBy as the
    count, so the election adds no shuffle."""
    occ = positional_ngrams(docs, id_col, text_col, k)
    aggs = [F.count(F.lit(1)).alias("gram_count")]
    if keep_one:
        aggs.append(
            F.min(
                F.struct(F.col(id_col).alias("i"), F.col("start").alias("s"))
            ).alias("_canon")
        )
    freq = occ.groupBy("gram").agg(*aggs).where(
        F.col("gram_count") >= min_count
    )
    # sort-merge on the gram string: occurrence side is corpus-sized
    # (see module docstring); dup-gram side is output-sized but has no
    # a-priori bound — the spilling strategy is the only safe default
    joined = occ.hint("merge").join(freq.hint("merge"), "gram")
    if keep_one:
        joined = joined.where(
            ~(
                (F.col(id_col) == F.col("_canon.i"))
                & (F.col("start") == F.col("_canon.s"))
            )
        ).drop("_canon")
    return joined


def _spans_from_covered(covered):
    """array<int> of covered token indices (sorted, distinct) → maximal
    [lo, hi] islands, as array<struct<lo,hi>> — linear zip_with fold."""
    n = F.size(covered)
    head = F.slice(covered, 1, n - 1)
    tail = F.slice(covered, 2, n - 1)
    # interior island boundaries: consecutive covered indices that jump
    interior_lo = F.filter(
        F.zip_with(tail, head, lambda a, b: F.when(a - b > 1, a)),
        lambda x: x.isNotNull(),
    )
    interior_hi = F.filter(
        F.zip_with(tail, head, lambda a, b: F.when(a - b > 1, b)),
        lambda x: x.isNotNull(),
    )
    los = F.concat(F.slice(covered, 1, 1), interior_lo)
    his = F.concat(interior_hi, F.slice(covered, -1, 1))
    return F.zip_with(
        los, his, lambda lo, hi: F.struct(lo.alias("lo"), hi.alias("hi"))
    )


def duplicated_span_table_dual(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 8,
    min_count: int = 2,
    k1_clean_text: bool = False,
) -> DataFrame:
    """BOTH removal deployments from ONE gram pass: the all-copies
    profile (``dup_spans`` / ``dup_token_count`` / ``clean_text``) and
    the keep-one profile (``k1_dup_spans`` / ``k1_dup_token_count`` /
    optional ``k1_clean_text`` — a second per-token rebuild pass, so
    off by default) in the same row.

    Calling :func:`duplicated_span_table` twice would tokenize, explode,
    shuffle, and join the corpus twice; here the positional-gram table,
    the frequency+canon groupBy, and the sort-merge occurrence join run
    once, and the two profiles diverge only in cheap per-doc array
    expressions (the canonical occurrence is excluded from the k1
    covered set). Guaranteed identical to the two separate tables
    (pinned in tests)."""
    occ = positional_ngrams(docs, id_col, text_col, k)
    freq = (
        occ.groupBy("gram")
        .agg(
            F.count(F.lit(1)).alias("gram_count"),
            F.min(
                F.struct(F.col(id_col).alias("i"), F.col("start").alias("s"))
            ).alias("_canon"),
        )
        .where(F.col("gram_count") >= min_count)
    )
    flagged = occ.hint("merge").join(freq.hint("merge"), "gram")
    not_canon = ~(
        (F.col(id_col) == F.col("_canon.i"))
        & (F.col("start") == F.col("_canon.s"))
    )
    per_doc = flagged.groupBy(id_col).agg(
        F.sort_array(F.collect_set("start")).alias("starts"),
        # when() is NULL on canonical rows; collect_set drops NULLs
        F.sort_array(
            F.collect_set(F.when(not_canon, F.col("start")))
        ).alias("starts_k1"),
    )

    def cov(starts):
        return F.array_sort(
            F.array_distinct(
                F.flatten(
                    F.transform(starts, lambda p: F.sequence(p, p + (k - 1)))
                )
            )
        )

    def spans_of(covered):
        # starts_k1 can be empty (every flagged start canonical) — guard
        # before _spans_from_covered's slice arithmetic
        return F.when(
            F.size(covered) > 0, _spans_from_covered(covered)
        ).otherwise(F.array().cast("array<struct<lo:int,hi:int>>"))

    c_all, c_k1 = cov(F.col("starts")), cov(F.col("starts_k1"))
    spans = per_doc.select(
        id_col,
        c_all.alias("covered"),
        spans_of(c_all).alias("dup_spans"),
        c_k1.alias("covered_k1"),
        spans_of(c_k1).alias("k1_dup_spans"),
    )
    tok_docs = docs.select(
        *docs.columns, tokens(F.col(text_col)).alias("_toks")
    ).repartition(F.col(id_col))

    def keep(covered):
        pos = F.array_except(
            F.sequence(F.lit(1), F.size("_toks")),
            F.coalesce(covered, F.array()),
        )
        guarded = F.when(F.size("_toks") > 0, pos).otherwise(
            F.array().cast("array<int>")
        )
        return F.concat_ws(
            " ",
            F.transform(guarded, lambda p: F.element_at(F.col("_toks"), p)),
        )

    empty_spans = F.array().cast("array<struct<lo:int,hi:int>>")
    cols = [
        *docs.columns,
        F.coalesce("dup_spans", empty_spans).alias("dup_spans"),
        F.coalesce(F.size(F.col("dup_spans")), F.lit(0)).alias("n_dup_spans"),
        F.coalesce(F.size("covered"), F.lit(0)).alias("dup_token_count"),
        keep(F.col("covered")).alias("clean_text"),
        F.coalesce("k1_dup_spans", empty_spans).alias("k1_dup_spans"),
        F.coalesce(F.size(F.col("k1_dup_spans")), F.lit(0)).alias(
            "k1_n_dup_spans"
        ),
        F.coalesce(F.size("covered_k1"), F.lit(0)).alias(
            "k1_dup_token_count"
        ),
    ]
    if k1_clean_text:
        cols.append(keep(F.col("covered_k1")).alias("k1_clean_text"))
    return tok_docs.join(spans, id_col, "left").select(*cols)


def duplicated_span_table(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 8,
    min_count: int = 2,
    keep_one: bool = False,
) -> DataFrame:
    """Per-document duplicated-substring summary:

    - ``dup_spans``: maximal corpus-duplicated token spans, 1-based
      inclusive [lo, hi] (empty array when clean);
    - ``n_dup_spans`` / ``dup_token_count``: span count, covered tokens;
    - ``clean_text``: the document with every covered token removed
      (single spaces; '' when fully duplicated).

    ``keep_one=True`` leaves each duplicated passage's canonical copy
    (lexicographically-first (id, start) per gram) unflagged, so it
    survives in that document's ``clean_text``.

    Every input document appears exactly once (left join back)."""
    flagged = flagged_occurrences(
        docs, id_col, text_col, k, min_count, keep_one
    )
    per_doc = flagged.groupBy(id_col).agg(
        F.sort_array(F.collect_set("start")).alias("starts")
    )
    covered = F.array_sort(
        F.array_distinct(
            F.flatten(
                F.transform(
                    F.col("starts"),
                    lambda p: F.sequence(p, p + (k - 1)),
                )
            )
        )
    )
    spans = per_doc.select(
        id_col,
        covered.alias("covered"),
        _spans_from_covered(covered).alias("dup_spans"),
    )
    # tokenize ONCE behind an id-hash exchange: element_at inside the
    # transform below must index a bound array attribute, not re-split
    # the text per kept token (quadratic — the top_token_ratio lesson).
    # Partitioning by id makes the exchange double as the join shuffle,
    # so the barrier costs nothing extra.
    tok_docs = docs.select(
        *docs.columns, tokens(F.col(text_col)).alias("_toks")
    ).repartition(F.col(id_col))
    keep_pos = F.array_except(
        F.sequence(F.lit(1), F.size("_toks")),
        F.coalesce("covered", F.array()),
    )
    return (
        tok_docs.join(spans, id_col, "left")
        .select(
            *docs.columns,
            "_toks",
            F.coalesce(
                "dup_spans",
                F.array().cast("array<struct<lo:int,hi:int>>"),
            ).alias("dup_spans"),
            F.coalesce(F.size("covered"), F.lit(0)).alias(
                "dup_token_count"
            ),
            F.when(F.size("_toks") > 0, keep_pos)
            .otherwise(F.array().cast("array<int>"))
            .alias("_keep"),
        )
        .select(
            *docs.columns,
            "dup_spans",
            F.size("dup_spans").alias("n_dup_spans"),
            "dup_token_count",
            F.concat_ws(
                " ",
                F.transform(
                    "_keep",
                    lambda p: F.element_at(F.col("_toks"), p),
                ),
            ).alias("clean_text"),
        )
    )
