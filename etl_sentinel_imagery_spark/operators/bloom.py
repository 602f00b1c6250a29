"""Mergeable Bloom filters as DataFrame values — the broadcast
membership pre-filter.

The 100 TB shape this exists for: an anti-join (decontamination,
blocklist removal, "not already ingested") where the probe side is the
full corpus. A shuffle anti-join moves the corpus; a broadcast hash
anti-join needs the build side's full key set in memory. The Bloom
filter compresses the build side to a bit array (~1.2 bytes/key at 1%
FP) that rides into the scan stage, so the corpus is filtered WITHOUT
any shuffle — and because Bloom membership has no false negatives, a
small exact verify join on the (rare) bloom-positive rows restores
exact semantics. Spark's own runtime-filter feature applies the same
idea inside joins; this operator makes the filter a first-class,
persistable, MERGEABLE value (word-wise OR — build per partition/day,
OR together later) the pipeline can reuse across jobs.

Layout: ``array<long>`` words, 32 payload bits per word (bits 0..31).
Half the packing density of a raw bitset, chosen deliberately: bit
masks come from ``pow(2, bit)`` — exact in doubles up to 2^31 and safe
to cast to long — which, unlike ``shiftleft``, works INSIDE higher-
order-function lambdas (pyspark's shiftleft only takes a literal shift
amount). That keeps the membership test a pure JVM expression usable
under ``F.exists`` over a document's gram array.

Hashing: Kirsch–Mitzenmacher double hashing over the engine-portable
polynomial hash (functions.text.polyhash): position_i =
(h1 + i·h2) mod n_bits with h1, h2 two universal-hash permutations of
the key hash — k positions from one string fold.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_sentinel_imagery_spark.functions.text import HASH_MOD, polyhash

#: Payload bits per array<long> word (see module docstring).
WORD_BITS = 32

#: Universal-hash parameters for the two derived hashes (distinct from
#: the MinHash permutation family in operators.dedup).
_H1_A, _H1_B = 7919, 104729
_H2_A, _H2_B = 15485863, 32452843


def _positions(h: Column, n_bits: int, n_hashes: int) -> list[Column]:
    """k bit positions for a key hash (double hashing; h2 forced odd so
    every stride cycles the full power-of-two table)."""
    h1 = (h * _H1_A + _H1_B) % HASH_MOD % n_bits
    h2 = ((h * _H2_A + _H2_B) % HASH_MOD).bitwiseOR(F.lit(1))
    return [(h1 + F.lit(i) * h2) % n_bits for i in range(n_hashes)]


def _mask(bit: Column) -> Column:
    """2^bit as a long — exact for bit < 32, HOF-lambda-safe."""
    return F.pow(F.lit(2.0), bit.cast("double")).cast("long")


def bloom_words_per_group(
    df: DataFrame,
    group_cols: list[str],
    key: Column,
    n_bits: int,
    n_hashes: int,
) -> DataFrame:
    """One Bloom word array PER GROUP (empty ``group_cols`` = one filter
    for the whole frame): keys explode to k (word, mask) pairs, the
    per-(group, word) ``bit_or`` is map-side combinable (the shuffle
    carries ≤ n_groups × n_words rows however big the input), then one
    dense-array assembly per group. The single shared implementation of
    the word layout — bloom_build and the file-skipping index
    (operators.skipping) both delegate here, so the layout cannot
    drift between builder and ``bloom_contains``."""
    if n_bits & (n_bits - 1):
        raise ValueError("n_bits must be a power of two")
    n_words = n_bits // WORD_BITS
    h = polyhash(key)
    pos = F.array(*_positions(h, n_bits, n_hashes))
    per_word = (
        df.select(*group_cols, F.explode(pos).alias("_pos"))
        .select(
            *group_cols,
            (F.col("_pos") / WORD_BITS).cast("int").alias("_w"),
            _mask(F.col("_pos") % WORD_BITS).alias("_m"),
        )
        .groupBy(*group_cols, "_w")
        .agg(F.bit_or("_m").alias("_bits"))
    )
    # Dense assembly is ONE linear pass over the sorted sparse
    # entries: each (word, bits) contributes its zero-gap run + its
    # word, and a trailing run pads to n_words. The previous form
    # looked every one of the n_words indices up in a MAP — Spark's
    # map element_at is a LINEAR key scan, so assembly was
    # O(n_words²) per group: building 64 one-Mbit filters took 738 s
    # (tools/stress_merge.py found it); this form is seconds.
    def _run(e, j):
        prev_w = F.when(j == F.lit(0), F.lit(-1)).otherwise(
            F.element_at(F.col("_entries"), j)["_w"]  # 1-based: E[j-1]
        )
        return F.concat(
            F.array_repeat(
                F.lit(0).cast("long"),
                (e["_w"] - prev_w - 1).cast("int"),
            ),
            F.array(e["_bits"]),
        )

    last_w = F.element_at(F.col("_entries"), F.size("_entries"))["_w"]
    dense = F.concat(
        F.flatten(F.transform(F.col("_entries"), _run)),
        F.array_repeat(
            F.lit(0).cast("long"),
            (F.lit(n_words - 1) - last_w).cast("int"),
        ),
    )
    return (
        per_word.groupBy(*group_cols)
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col("_w"), F.col("_bits")))
            ).alias("_entries")
        )
        .select(
            *group_cols,
            dense.alias("words"),
            F.lit(n_bits).alias("n_bits"),
            F.lit(n_hashes).alias("n_hashes"),
        )
    )


def bloom_build(
    df: DataFrame,
    key_col: Column | str,
    n_bits: int = 1 << 20,
    n_hashes: int = 4,
) -> DataFrame:
    """Build one Bloom filter over every value of ``key_col``:
    a single-row DataFrame (words array<long>, n_bits, n_hashes).
    See :func:`bloom_words_per_group` for the shape argument."""
    key = F.col(key_col) if isinstance(key_col, str) else key_col
    return bloom_words_per_group(df, [], key, n_bits, n_hashes)


def bloom_merge_cols(a: Column, b: Column) -> Column:
    """Word-wise OR — the exact, associative, commutative merge (filters
    must share n_bits/n_hashes)."""
    return F.zip_with(a, b, lambda x, y: x.bitwiseOR(y))


def bloom_contains_hash(
    words: Column, h: Column, n_bits: int, n_hashes: int
) -> Column:
    """Membership test from a precomputed key hash — k word lookups, no
    shuffle, safe inside HOF lambdas (masks via pow, not shiftleft)."""
    cond = F.lit(True)
    for p in _positions(h, n_bits, n_hashes):
        w = (p / WORD_BITS).cast("int")
        test = F.element_at(words, w + 1).bitwiseAND(_mask(p % WORD_BITS)) != 0
        cond = cond & test
    return cond


def bloom_contains(
    words: Column, key: Column, n_bits: int, n_hashes: int
) -> Column:
    """Membership test for a string key column."""
    return bloom_contains_hash(words, polyhash(key), n_bits, n_hashes)


def bloom_filter_members(
    df: DataFrame,
    key_col: str,
    bloom: DataFrame,
    negate: bool = False,
) -> DataFrame:
    """Filter ``df`` to rows whose key is (possibly) in the filter —
    or, with ``negate``, to rows DEFINITELY absent.

    The one-row filter joins in as a broadcast cross join, so the test
    runs inside df's scan stage. ``negate=True`` is the exact-semantics
    direction (no false negatives ⇒ dropped rows are provably absent);
    ``negate=False`` keeps false positives and needs a verify step for
    exactness."""
    # one execution of the build aggregation: the collected row supplies
    # n_bits/n_hashes AND the words — re-referencing `bloom` in the join
    # would re-run the whole build from lineage
    row = bloom.collect()[0]
    n_bits, n_hashes = int(row["n_bits"]), int(row["n_hashes"])
    words_df = df.sparkSession.createDataFrame(
        [(list(row["words"]),)], "words array<bigint>"
    )
    joined = df.crossJoin(F.broadcast(words_df))
    cond = bloom_contains(F.col("words"), F.col(key_col), n_bits, n_hashes)
    # polyhash(NULL) is NULL, so the membership test is NULL for NULL
    # keys and a bare ~cond would drop them from the "definitely absent"
    # output even though a NULL key is provably not in the filter.
    # Coalesce to False BEFORE negation: NULL keys are excluded from the
    # positive direction (can't hash ⇒ can't be a member) and kept in
    # the negated one.
    cond = F.coalesce(cond, F.lit(False))
    if negate:
        cond = ~cond
    return joined.filter(cond).drop("words")


def false_positive_rate(n_keys: int, n_bits: int, n_hashes: int) -> float:
    """Theoretical FP rate (1 - e^{-kn/m})^k for sizing/tests."""
    return (1.0 - math.exp(-n_hashes * n_keys / n_bits)) ** n_hashes
