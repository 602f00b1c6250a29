"""Corpus-wide duplicated-line removal (the CCNet / RefinedWeb pass).

Web-scale curation removes LINES (paragraphs) that repeat across the
corpus — boilerplate headers, navigation text, cookie banners — before
any document-level dedup runs (Wenzek et al. 2019, CCNet; Penedo et
al. 2023, RefinedWeb). The reference repo has no text layer at all
(SURVEY.md §2.10 marks the whole family as (ext) north-star scope);
this module is the line-resolution sibling of
``operators.substring_dedup`` (token-k-gram resolution) and
``operators.dedup`` (document resolution).

Two deployments, both computed from ONE line-frequency pass:

- **drop-all** — every occurrence of a corpus-duplicated line is
  removed (CCNet's choice: boilerplate carries no training value);
- **keep-first** (``k1``) — the globally first occurrence
  (min ``(id, line_no)``) survives, the rest are removed — the same
  canonical-election rule as ``substring_dedup(keep_one=True)``.

100 TB shape: the explode is narrow (linear in corpus bytes); the
frequency table is ONE map-side-combinable groupBy on the 16-byte
``md5(line)`` key (never the line text — the shuffle carries hashes,
not paragraphs); the mark join is hash-keyed and sort-merge (the
duplicated-line table is corpus-sized in the adversarial case — the
engine's spilling-strategy rule for corpus-sized sides, see
ROADMAP/PERF on the 1M-doc shuffle_hash OOM); reassembly is one
groupBy on the doc id. No window over the corpus, no driver
materialization. md5 collisions conflate two distinct lines with
probability ~2^-128 — and identically so in the DuckDB oracle, which
groups by the same md5.

Eligibility (``min_chars``) is a function of the line CONTENT only, so
all occurrences of a given line are uniformly eligible — the frequency
table never needs per-occurrence eligibility flags.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Lines shorter than this never count as duplicates (blank lines and
#: stray punctuation would otherwise weld every document together).
DEFAULT_MIN_CHARS = 20


def line_table(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    delim: str = "\n",
) -> DataFrame:
    """Explode documents into ``(id, line_no, line)`` — 1-based
    ``line_no`` preserving document order. ``delim`` is a LITERAL
    separator (regex-escaped before hitting ``F.split``)."""
    return docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), re.escape(delim), -1)).alias(
            "pos", "line"
        ),
    ).select(
        id_col, (F.col("pos") + 1).alias("line_no"), "line"
    )


def duplicated_line_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    delim: str = "\n",
    min_count: int = 2,
    min_chars: int = DEFAULT_MIN_CHARS,
) -> DataFrame:
    """Per-document line-dedup profile, both deployments in one pass.

    Returns one row per input document::

        (id, n_lines, n_dup_lines, k1_n_dup_lines,
         line_clean_text, k1_line_clean_text)

    ``n_dup_lines`` counts THIS document's occurrences of corpus-
    duplicated lines (drop-all removal count); ``k1_*`` is the
    keep-first deployment (surviving first occurrences stay).
    ``*_clean_text`` is the document re-assembled from the kept lines
    with ``delim`` — empty string when every line is removed (the row
    itself never disappears). Exception: docs whose text is NULL have
    no line rows at all and thus NO stats row — consumers must left-
    join (as :func:`remove_duplicated_lines` does).
    """
    lines = line_table(docs, id_col, text_col, delim).withColumn(
        "line_key", F.md5("line")
    )
    # one combinable groupBy on the 16-byte key; min(struct) elects the
    # keep-first canonical occurrence inside the SAME aggregation
    freq = (
        lines.where(F.length("line") >= min_chars)
        .groupBy("line_key")
        .agg(
            F.count(F.lit(1)).alias("n_occ"),
            F.min(F.struct(F.col(id_col), F.col("line_no"))).alias(
                "first_occ"
            ),
        )
        .where(F.col("n_occ") >= min_count)
    )
    # corpus-sized side → sort-merge (the spilling strategy)
    marked = lines.join(freq.hint("merge"), "line_key", "left")
    is_dup = F.col("n_occ").isNotNull()
    is_first = is_dup & (
        (F.col("first_occ")[id_col] == F.col(id_col))
        & (F.col("first_occ")["line_no"] == F.col("line_no"))
    )

    def _clean(ls: Column, keep: Column) -> Column:
        return F.array_join(
            F.transform(F.filter(ls, keep), lambda x: x["line"]),
            delim,
        )

    agg = marked.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(is_dup.cast("long")).alias("n_dup_lines"),
        F.sum((is_dup & ~is_first).cast("long")).alias("k1_n_dup_lines"),
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col("line_no"),
                    F.col("line"),
                    is_dup.alias("is_dup"),
                    is_first.alias("is_first"),
                )
            )
        ).alias("ls"),
    )
    return agg.select(
        id_col,
        "n_lines",
        "n_dup_lines",
        "k1_n_dup_lines",
        _clean(F.col("ls"), lambda x: ~x["is_dup"]).alias(
            "line_clean_text"
        ),
        _clean(
            F.col("ls"), lambda x: ~x["is_dup"] | x["is_first"]
        ).alias("k1_line_clean_text"),
    )


def remove_duplicated_lines(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    delim: str = "\n",
    min_count: int = 2,
    min_chars: int = DEFAULT_MIN_CHARS,
    keep_first: bool = False,
) -> DataFrame:
    """``docs`` with ``text_col`` rewritten to the line-deduplicated
    text (plus ``n_dup_lines_removed``); all other columns pass
    through — ONE row per input row, always. Docs with NULL text have
    no line rows (``posexplode`` of NULL emits nothing) and hence no
    stats row; the LEFT join + coalesce keeps them untouched with
    ``n_dup_lines_removed = 0`` instead of silently dropping them
    (ADVICE r4 — the inner-join form vanished NULL-text docs from
    ``curate_corpus`` whenever ``line_dedup_min_count`` was set)."""
    stats = duplicated_line_stats(
        docs, id_col, text_col, delim, min_count, min_chars
    )
    kept = "k1_line_clean_text" if keep_first else "line_clean_text"
    removed = (
        F.col("k1_n_dup_lines") if keep_first else F.col("n_dup_lines")
    )
    return (
        docs.join(
            stats.select(
                id_col,
                F.col(kept).alias("_line_clean"),
                removed.alias("_n_removed"),
            ),
            id_col,
            "left",
        )
        .withColumn(text_col, F.coalesce("_line_clean", text_col))
        .withColumn(
            "n_dup_lines_removed", F.coalesce("_n_removed", F.lit(0))
        )
        .drop("_line_clean", "_n_removed")
    )
