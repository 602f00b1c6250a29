"""Train/eval contamination detection — benchmark decontamination.

Before training, every serious LLM data pipeline checks the training
corpus for verbatim overlap with its evaluation benchmarks (n-gram
collision is the standard test). The scale shape matters: the TRAIN side
is the 100 TB corpus and must never shuffle on gram text; the EVAL side
is a few thousand benchmark documents. So the eval side's distinct
n-grams are built first and broadcast, and the train side streams
through a broadcast hash join — contaminated grams are identified inside
the scan stage, and only the (train_id, eval_id, gram-hit) triples (a
vanishingly small set) reach the one aggregation shuffle.

No reference analog; part of the SURVEY.md §2.10 LLM-pipeline
extensions, alongside operators.dedup (which catches train-train
duplication; this catches train-EVAL leakage).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_sentinel_imagery_spark.functions.text import word_ngrams

#: Standard decontamination gram length (long enough that natural reuse
#: of phrases is rare; 8-13 are the published range).
CONTAM_N = 8


def ngram_contamination(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = CONTAM_N,
    min_shared: int = 1,
) -> DataFrame:
    """(train_id, eval_id, n_shared_grams) for every train/eval pair
    sharing ≥ ``min_shared`` distinct word n-grams.

    Both sides' grams are DISTINCT per document (word_ngrams dedups), so
    the count is set-intersection size — a repeated boilerplate phrase
    inside one doc cannot inflate it."""
    ev = eval_df.select(
        F.col(id_col).alias("eval_id"),
        F.explode(word_ngrams(F.col(text_col), n)).alias("gram"),
    )
    tr = train.select(
        F.col(id_col).alias("train_id"),
        F.explode(word_ngrams(F.col(text_col), n)).alias("gram"),
    )
    return (
        tr.join(F.broadcast(ev), "gram")
        .groupBy("train_id", "eval_id")
        .agg(F.count(F.lit(1)).alias("n_shared_grams"))
        .filter(F.col("n_shared_grams") >= min_shared)
    )


def contaminated_train_ids(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = CONTAM_N,
    min_shared: int = 1,
) -> DataFrame:
    """Distinct train-doc ids to QUARANTINE (hit ≥ min_shared grams of
    any eval doc) — the set an anti-join removes before training."""
    hits = ngram_contamination(train, eval_df, id_col, text_col, n, min_shared)
    return hits.select(F.col("train_id").alias(id_col)).distinct()


def decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = CONTAM_N,
    min_shared: int = 1,
) -> DataFrame:
    """Training corpus with contaminated docs removed (left-anti join on
    the quarantine set — the id set is small, so the anti join
    broadcasts)."""
    bad = contaminated_train_ids(train, eval_df, id_col, text_col, n, min_shared)
    return train.join(F.broadcast(bad), id_col, "left_anti")


def decontaminate_bloom(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = CONTAM_N,
    min_shared: int = 1,
    n_bits: int = 1 << 20,
    n_hashes: int = 4,
) -> DataFrame:
    """Exact decontamination with a Bloom pre-filter (operators.bloom) —
    the shape for when the eval gram set outgrows a comfortable broadcast
    hash join: the grams compress to an n_bits/8-byte filter that tests
    every train gram INSIDE the scan stage.

    Three stages, exactness preserved end to end:

    1. eval grams → one Bloom filter (tiny, built once, mergeable
       across benchmark suites).
    2. train docs split by `EXISTS gram: bloom(gram)` — a narrow
       projection, no shuffle. No-hit docs are PROVABLY clean (Bloom
       has no false negatives) and pass straight through.
    3. only the bloom-positive suspects (true contaminations + FP rate
       × corpus) pay the exact gram join of :func:`decontaminate`.

    Returns exactly ``decontaminate(train, eval_df, ...)`` row-for-row.
    """
    from etl_sentinel_imagery_spark.operators.bloom import (
        bloom_build,
        bloom_contains_hash,
    )
    from etl_sentinel_imagery_spark.functions.text import polyhash

    ev_grams = eval_df.select(
        F.explode(word_ngrams(F.col(text_col), n)).alias("gram")
    ).distinct()
    bloom = bloom_build(ev_grams, "gram", n_bits=n_bits, n_hashes=n_hashes)

    gram_hashes = F.transform(word_ngrams(F.col(text_col), n), polyhash)
    hit = F.exists(
        gram_hashes,
        lambda h: bloom_contains_hash(F.col("words"), h, n_bits, n_hashes),
    )
    # ONE bloom scan of the corpus, reduced to the (tiny) suspect-id set
    # and materialized — fanning the tagged corpus into multiple branches
    # would re-run the per-gram k-probe scan once per branch. The final
    # answer needs only `train ∖ quarantined`, and quarantined ⊆
    # suspects, so the clean/suspect split never has to appear in the
    # output plan at all.
    suspect_ids = (
        train.crossJoin(F.broadcast(bloom.select("words")))
        .filter(hit)
        .select(id_col)
        .localCheckpoint(eager=True)
    )
    suspects = train.join(F.broadcast(suspect_ids), id_col, "left_semi")
    bad = contaminated_train_ids(suspects, eval_df, id_col, text_col, n, min_shared)
    return train.join(F.broadcast(bad), id_col, "left_anti")
