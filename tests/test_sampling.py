"""Deterministic sampling/splitting/mixing + decontamination operators.

Cross-engine determinism is checked against DuckDB where the semantics
are SQL-expressible (hash buckets, split assignment); scale properties
(broadcast on the eval side of contamination) are asserted on the plan.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from etl_sentinel_imagery_spark.operators.decontaminate import (
    contaminated_train_ids,
    decontaminate,
    ngram_contamination,
)
from etl_sentinel_imagery_spark.operators.sampling import (
    HASH_SPACE,
    assign_split,
    assign_split_sql,
    hash_bucket,
    hash_bucket_sql,
    hash_sample,
    stratified_sample,
    weighted_mix,
)
from etl_sentinel_imagery_spark.sources.tables import load_table
from tests.conftest import SF_DIR


def test_hash_bucket_matches_duckdb(spark):
    docs = load_table(spark, SF_DIR, "documents").limit(50)
    got = {
        r["doc_id"]: r["b"]
        for r in docs.select(
            "doc_id", hash_bucket("doc_id", seed="s1").alias("b")
        ).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    want = dict(
        con.execute(
            f"SELECT doc_id, {hash_bucket_sql('doc_id', 's1')} "
            f"FROM documents LIMIT 50"
        ).fetchall()
    )
    assert got == {k: want[k] for k in got}
    assert all(0 <= b < HASH_SPACE for b in got.values())


def test_hash_sample_deterministic_and_sized(spark):
    docs = load_table(spark, SF_DIR, "documents")
    n = docs.count()
    s1 = hash_sample(docs, "doc_id", 0.2, seed="a")
    ids1 = {r["doc_id"] for r in s1.select("doc_id").collect()}
    ids2 = {r["doc_id"] for r in hash_sample(docs, "doc_id", 0.2, seed="a").select("doc_id").collect()}
    assert ids1 == ids2  # repeatable
    # uniform hash → sample size within a loose binomial band
    assert 0.1 * n < len(ids1) < 0.3 * n
    # monotone: a bigger fraction strictly contains a smaller one
    ids_half = {r["doc_id"] for r in hash_sample(docs, "doc_id", 0.5, seed="a").select("doc_id").collect()}
    assert ids1 <= ids_half
    # different seed → different draw
    ids_b = {r["doc_id"] for r in hash_sample(docs, "doc_id", 0.2, seed="b").select("doc_id").collect()}
    assert ids1 != ids_b


def test_assign_split_matches_duckdb_and_partitions(spark):
    weights = {"train": 0.8, "val": 0.1, "test": 0.1}
    docs = load_table(spark, SF_DIR, "documents")
    got = {
        r["doc_id"]: r["split"]
        for r in docs.select(
            "doc_id", assign_split("doc_id", weights, seed="sp").alias("split")
        ).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    want = dict(
        con.execute(
            f"SELECT doc_id, {assign_split_sql('doc_id', weights, 'sp')} "
            f"FROM documents"
        ).fetchall()
    )
    assert got == want
    # every row gets exactly one label; train dominates
    counts = {}
    for v in got.values():
        counts[v] = counts.get(v, 0) + 1
    assert set(counts) <= {"train", "val", "test"}
    assert counts["train"] > counts.get("val", 0)
    assert counts["train"] > counts.get("test", 0)


def test_assign_split_rejects_bad_weights(spark):
    with pytest.raises(ValueError, match="sum to 1"):
        assign_split("doc_id", {"a": 0.5, "b": 0.2})


def test_stratified_sample_per_stratum_fractions(spark):
    docs = load_table(spark, SF_DIR, "documents")
    out = stratified_sample(
        docs, "doc_id", "lang", {"en": 1.0, "de": 0.0}, default_fraction=0.5
    )
    langs = dict(
        out.groupBy("lang").count().collect()
    ) if False else {r["lang"]: r["count"] for r in out.groupBy("lang").count().collect()}
    base = {r["lang"]: r["count"] for r in docs.groupBy("lang").count().collect()}
    assert langs.get("en") == base.get("en")  # keep all
    assert "de" not in langs  # drop all
    for lang, n in base.items():
        if lang in ("en", "de"):
            continue
        assert 0.25 * n < langs.get(lang, 0) < 0.75 * n  # ≈ half


def test_weighted_mix_tags_and_downsamples(spark):
    docs = load_table(spark, SF_DIR, "documents")
    web = docs.filter(F.col("doc_id") % 2 == 0)
    books = docs.filter(F.col("doc_id") % 2 == 1)
    mixed = weighted_mix(
        {"web": (web, 0.25), "books": (books, 1.0)}, "doc_id", seed="mx"
    )
    counts = {r["mix_source"]: r["count"] for r in mixed.groupBy("mix_source").count().collect()}
    assert counts["books"] == books.count()  # weight 1.0 keeps everything
    nw = web.count()
    assert 0.1 * nw < counts["web"] < 0.45 * nw  # ≈ quarter
    # deterministic: re-running yields the identical selection
    again = weighted_mix(
        {"web": (web, 0.25), "books": (books, 1.0)}, "doc_id", seed="mx"
    )
    assert {tuple(r) for r in mixed.select("doc_id", "mix_source").collect()} == {
        tuple(r) for r in again.select("doc_id", "mix_source").collect()
    }


def test_contamination_finds_planted_overlap(spark):
    train = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog every single day"),
            (2, "completely unrelated content about spark partitions and shuffles"),
            (3, "another clean document with no benchmark text at all here"),
        ],
        "doc_id long, text string",
    )
    eval_df = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog every single morning")],
        "doc_id long, text string",
    )
    hits = ngram_contamination(train, eval_df, n=8).collect()
    assert {(r["train_id"], r["eval_id"]) for r in hits} == {(1, 100)}
    # "the quick ... lazy dog every single" → shared 8-gram window count
    assert hits[0]["n_shared_grams"] >= 3

    bad = contaminated_train_ids(train, eval_df, n=8)
    assert {r["doc_id"] for r in bad.collect()} == {1}

    clean = decontaminate(train, eval_df, n=8)
    assert {r["doc_id"] for r in clean.collect()} == {2, 3}


def test_contamination_eval_side_broadcast(spark):
    """Scale shape: the eval gram set must be the broadcast side; the
    train corpus must not shuffle on gram text."""
    docs = load_table(spark, SF_DIR, "documents")
    eval_df = docs.filter(F.col("doc_id") % 97 == 0)
    plan = ngram_contamination(docs, eval_df)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" not in plan
    assert "BroadcastHashJoin" in plan


def test_contamination_on_fixture_corpus_self_overlap(spark):
    """Every doc fully contaminates itself: using a slice of the corpus
    as the eval set must flag at least the overlapping ids (the fixture
    corpus also plants near-duplicates, which may add more)."""
    docs = load_table(spark, SF_DIR, "documents")
    eval_df = docs.filter(F.col("doc_id") < 5)
    bad = {r["doc_id"] for r in contaminated_train_ids(docs, eval_df).collect()}
    have_grams = {
        r["doc_id"]
        for r in docs.filter(F.col("doc_id") < 5)
        .select("doc_id", F.size(F.split(F.col("text"), " ")).alias("n"))
        .filter(F.col("n") >= 8)
        .collect()
    }
    assert have_grams <= bad


def test_sample_exact_n_deterministic_and_nested(spark):
    from etl_sentinel_imagery_spark.operators.sampling import sample_exact_n

    df = spark.range(1000).select(F.col("id").alias("doc_id"))
    s1 = {r["doc_id"] for r in sample_exact_n(df, 50, seed="s").collect()}
    s2 = {r["doc_id"] for r in sample_exact_n(df, 50, seed="s").collect()}
    assert s1 == s2 and len(s1) == 50
    # repartitioning cannot change the sample
    s3 = {
        r["doc_id"]
        for r in sample_exact_n(df.repartition(13), 50, seed="s").collect()
    }
    assert s3 == s1
    # nested: the 80-sample contains the 50-sample
    s80 = {r["doc_id"] for r in sample_exact_n(df, 80, seed="s").collect()}
    assert s1 <= s80
    # a different seed draws a different sample
    s_other = {
        r["doc_id"] for r in sample_exact_n(df, 50, seed="t").collect()
    }
    assert s_other != s1
    # plan: distributed top-n, never a global sort
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        sample_exact_n(df, 50, seed="s").explain("formatted")
    assert "TakeOrderedAndProject" in buf.getvalue()


def test_weighted_sample_exact_n_properties(spark):
    from pyspark.sql import functions as F

    from etl_sentinel_imagery_spark.operators.sampling import (
        weighted_sample_exact_n,
    )

    # 200 light rows (w=1) + 20 heavy rows (w=50)
    df = spark.range(0, 220).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 20, 50.0).otherwise(1.0).alias("w"),
    )
    s = weighted_sample_exact_n(df, 40, "w", seed="s1")
    rows = s.collect()
    assert len(rows) == 40
    heavy = sum(1 for r in rows if r["doc_id"] < 20)
    # heavy rows hold 1000/1200 of the total weight: expect most of the
    # 20 heavies in a 40-row sample (binomial tail makes <10 absurd)
    assert heavy >= 10

    # deterministic + partitioning-invariant
    a = sorted(r["doc_id"] for r in rows)
    b = sorted(
        r["doc_id"]
        for r in weighted_sample_exact_n(
            df.repartition(7), 40, "w", seed="s1"
        ).collect()
    )
    assert a == b
    # nested: the 20-sample is a subset of the 40-sample
    s20 = {
        r["doc_id"]
        for r in weighted_sample_exact_n(df, 20, "w", seed="s1").collect()
    }
    assert s20 <= set(a)
    # different seed → different sample (overwhelmingly)
    c = sorted(
        r["doc_id"]
        for r in weighted_sample_exact_n(df, 40, "w", seed="s2").collect()
    )
    assert a != c
    # non-positive weights never sampled
    df2 = df.withColumn(
        "w", F.when(F.col("doc_id") % 2 == 0, F.lit(-1.0)).otherwise(F.col("w"))
    )
    s2 = weighted_sample_exact_n(df2, 500, "w", seed="s1").collect()
    assert all(r["doc_id"] % 2 == 1 for r in s2)
    assert len(s2) == 110  # only the positive-weight rows exist


def test_upsample_epochs_deterministic_replication(spark):
    """upsample_epochs: floor(epochs) exact copies per row with a
    0..k-1 tag, fractional remainder hash-selected; deterministic and
    partitioning-invariant; epochs < 1 degrades to a tagged
    hash_sample; no row ever exceeds ceil(epochs) copies."""
    from etl_sentinel_imagery_spark.operators.sampling import (
        upsample_epochs,
    )

    df = spark.range(2000).select(F.col("id").alias("doc_id"))

    out = upsample_epochs(df, 2.25, seed="e1")
    per = {
        r["doc_id"]: r["n"]
        for r in out.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert set(per) == set(range(2000))  # integer part: nobody drops
    assert set(per.values()) <= {2, 3}
    n3 = sum(1 for v in per.values() if v == 3)
    assert 0.20 <= n3 / 2000 <= 0.30  # ~25% get the partial epoch
    # copy indexes are dense 0..n-1 per key
    tags = {
        (r["doc_id"], r["epoch_idx"]) for r in out.collect()
    }
    assert all(
        (d, i) in tags for d, n in per.items() for i in range(n)
    )

    # deterministic + partitioning-invariant
    again = {
        r["doc_id"]: r["n"]
        for r in upsample_epochs(df.repartition(13), 2.25, seed="e1")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert again == per

    # epochs < 1: tagged downsample, all tags 0
    sub = upsample_epochs(df, 0.5, seed="e2")
    n_sub = sub.count()
    assert 800 <= n_sub <= 1200
    assert sub.filter(F.col("epoch_idx") != 0).count() == 0

    with pytest.raises(ValueError, match="epochs"):
        upsample_epochs(df, 0.0)


def test_temperature_weights_formula():
    from etl_sentinel_imagery_spark.operators.sampling import (
        temperature_weights,
    )

    # alpha=1: natural proportions → keep everything
    assert temperature_weights({"a": 800, "b": 200}, 1.0) == {
        "a": 1.0, "b": 1.0,
    }
    # alpha=0: uniform shares → every source contributes min-count
    w0 = temperature_weights({"a": 800, "b": 200}, 0.0)
    assert w0["b"] == 1.0
    assert abs(w0["a"] - 200 / 800) < 1e-12
    # the binding source always keeps 100%; shares honor p_i ∝ n_i^α
    w = temperature_weights({"a": 900, "b": 100}, 0.5)
    pa_, pb = 900 ** 0.5, 100 ** 0.5
    n_out = min(900 / (pa_ / (pa_ + pb)), 100 / (pb / (pa_ + pb)))
    assert abs(w["a"] - n_out * (pa_ / (pa_ + pb)) / 900) < 1e-12
    assert w["b"] == 1.0
    import pytest

    with pytest.raises(ValueError):
        temperature_weights({"a": 0}, 0.5)
    with pytest.raises(ValueError):
        temperature_weights({}, 0.5)


def test_temperature_mix_flattens_shares(spark):
    from etl_sentinel_imagery_spark.operators.sampling import (
        temperature_mix,
    )

    df = (
        spark.range(10000)
        .select(
            F.col("id").alias("doc_id"),
            F.when(F.col("id") % 10 < 8, "big")
            .otherwise("small")
            .alias("src"),
        )
    )  # 8000 big / 2000 small
    out = temperature_mix(df, "src", "doc_id", alpha=0.0, seed="t")
    got = {r[0]: r[1] for r in out.groupBy("src").count().collect()}
    # uniform target: ~2000 each; hash sampling is approximate on the
    # downsampled source, exact on the binding one
    assert got["small"] == 2000
    assert abs(got["big"] - 2000) < 200
    # deterministic: the same call yields the same rows
    out2 = temperature_mix(df, "src", "doc_id", alpha=0.0, seed="t")
    assert out.exceptAll(out2).count() == 0
    assert out2.exceptAll(out).count() == 0
    # alpha=1: natural proportions — nothing dropped
    assert temperature_mix(df, "src", "doc_id", alpha=1.0).count() == 10000


def test_temperature_weights_closed_form():
    """The implementation's minimize-then-scale arithmetic must equal
    the closed form frac_i = (n_min / n_i)^(1-alpha) (derivation:
    n_j/p_j = n_j^(1-alpha)·Σn^alpha is minimized by n_min for
    alpha<1, and the Σ terms cancel)."""
    import random

    from etl_sentinel_imagery_spark.operators.sampling import (
        temperature_weights,
    )

    rng = random.Random(7)
    for _ in range(50):
        counts = {
            f"s{i}": rng.randint(1, 10**7)
            for i in range(rng.randint(1, 8))
        }
        alpha = rng.choice([0.0, 0.3, 0.5, 0.7, 1.0])
        w = temperature_weights(counts, alpha)
        n_min = min(counts.values())
        for s, n in counts.items():
            assert abs(w[s] - (n_min / n) ** (1 - alpha)) < 1e-9, (
                counts, alpha, s,
            )


def test_sample_token_budget_semantics(spark):
    """Budget semantics: selected = hash-order prefix; total crosses
    the budget by at most one doc; NESTED (budget N's selection ⊆
    budget N+M's); deterministic across partitionings; budget ≤ 0
    raises."""
    import pytest

    from etl_sentinel_imagery_spark.operators.sampling import (
        sample_token_budget,
        stratified_token_budget,
    )

    df = spark.range(200).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 7 + 1).cast("long").alias("n_tok"),
        F.concat(F.lit("src"), (F.col("id") % 2).cast("string")).alias(
            "source"
        ),
    )
    out = sample_token_budget(df, 100, "n_tok", seed="s").collect()
    total = sum(r["n_tok"] for r in out)
    max_tok = 7
    assert 100 <= total < 100 + max_tok
    # exclusive prefix recorded per row
    assert all(r["cum_before"] < 100 for r in out)

    small = {
        r["doc_id"]
        for r in sample_token_budget(df, 50, "n_tok", seed="s").collect()
    }
    big = {r["doc_id"] for r in out}
    assert small <= big  # nested

    repart = {
        r["doc_id"]
        for r in sample_token_budget(
            df.repartition(13), 100, "n_tok", seed="s"
        ).collect()
    }
    assert repart == big  # partitioning-independent

    strat = stratified_token_budget(
        df, "source", {"src0": 40, "src1": 25}, "n_tok", seed="s"
    ).collect()
    for src, budget in (("src0", 40), ("src1", 25)):
        tot = sum(r["n_tok"] for r in strat if r["source"] == src)
        assert budget <= tot < budget + max_tok

    with pytest.raises(ValueError, match="> 0"):
        sample_token_budget(df, 0, "n_tok")
