"""Bloom filter operator: no false negatives (the load-bearing property),
bounded false positives, exact word-wise-OR merge, and the bloom-
prefiltered decontamination's exact equality with the plain path."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_sentinel_imagery_spark.operators.bloom import (
    bloom_build,
    bloom_filter_members,
    bloom_merge_cols,
    false_positive_rate,
)
from etl_sentinel_imagery_spark.sources.tables import load_table
from tests.conftest import SF_DIR

N_BITS = 1 << 16
N_HASHES = 4


def _keys(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.concat(F.lit("key_"), F.col("id")).alias("k")
    )


def test_no_false_negatives(spark):
    """Every inserted key MUST test positive — this is what makes the
    negate direction (and the decontamination pre-filter) exact."""
    members = _keys(spark, 0, 2000)
    bloom = bloom_build(members, "k", n_bits=N_BITS, n_hashes=N_HASHES)
    missed = bloom_filter_members(members, "k", bloom, negate=True).count()
    assert missed == 0


def test_false_positive_rate_bounded(spark):
    """Non-member hit rate stays within ~3× the theoretical rate."""
    n_keys = 2000
    members = _keys(spark, 0, n_keys)
    others = _keys(spark, 100_000, 110_000)
    bloom = bloom_build(members, "k", n_bits=N_BITS, n_hashes=N_HASHES)
    hits = bloom_filter_members(others, "k", bloom).count()
    fp = hits / 10_000
    bound = false_positive_rate(n_keys, N_BITS, N_HASHES)
    assert fp <= 3 * bound + 0.01, (fp, bound)


def test_merge_equals_whole_build(spark):
    """bloom(A ∪ B) == OR(bloom(A), bloom(B)) word for word."""
    a = _keys(spark, 0, 1000)
    b = _keys(spark, 1000, 2000)
    whole = bloom_build(a.union(b), "k", n_bits=N_BITS, n_hashes=N_HASHES)
    ba = bloom_build(a, "k", n_bits=N_BITS, n_hashes=N_HASHES)
    bb = bloom_build(b, "k", n_bits=N_BITS, n_hashes=N_HASHES)
    merged = (
        ba.select(F.col("words").alias("wa"))
        .crossJoin(bb.select(F.col("words").alias("wb")))
        .select(bloom_merge_cols(F.col("wa"), F.col("wb")).alias("words"))
        .collect()[0]["words"]
    )
    assert list(merged) == list(whole.collect()[0]["words"])


def test_bloom_decontaminate_matches_plain_exactly(spark):
    """The bloom-prefiltered path returns the SAME surviving doc set as
    the plain broadcast-join path, and the pre-filter actually skips the
    exact join for most of the corpus."""
    from etl_sentinel_imagery_spark.operators.decontaminate import (
        decontaminate,
        decontaminate_bloom,
    )

    docs = load_table(spark, SF_DIR, "documents")
    # eval set: a slice of real docs → guaranteed verbatim overlap
    eval_df = docs.filter(F.col("doc_id") % 97 == 0)
    plain = {r["doc_id"] for r in decontaminate(docs, eval_df).select("doc_id").collect()}
    bloomed = {
        r["doc_id"]
        for r in decontaminate_bloom(docs, eval_df, n_bits=N_BITS)
        .select("doc_id")
        .collect()
    }
    assert bloomed == plain
    # sanity: contamination actually happened (the test isn't vacuous)
    assert len(plain) < docs.count()


def test_null_keys_definitely_absent_not_dropped(spark):
    """polyhash(NULL) is NULL; without the coalesce, NULL-key rows would
    vanish from BOTH directions. Semantics pinned here: a NULL key is
    provably not in the filter, so it lands in the negate output and is
    excluded from the positive one."""
    bloom = bloom_build(_keys(spark, 0, 100), "k", N_BITS, N_HASHES)
    probe = _keys(spark, 0, 10).unionByName(
        spark.range(1).select(F.lit(None).cast("string").alias("k"))
    )
    absent = bloom_filter_members(probe, "k", bloom, negate=True)
    assert [r["k"] for r in absent.collect()] == [None]
    present = bloom_filter_members(probe, "k", bloom, negate=False)
    assert None not in {r["k"] for r in present.collect()}
    assert present.count() == 10
