"""End-to-end curation plan: every stage must catch its planted case."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_sentinel_imagery_spark.plans.corpus_pipeline import (
    CurationConfig,
    curate_corpus,
)

GOOD = (
    "the quick brown fox jumps over a lazy dog while the calm river "
    "flows past ancient stone bridges toward distant mountain valleys"
)


def _mk_docs(spark):
    rows = [
        (1, "en", GOOD),
        (2, "en", GOOD.replace("dog", "cat")),  # near-dup of 1 → clustered
        (3, "en", GOOD),  # exact dup of 1 → clustered
        (4, "en", "too short"),  # quality: min_tokens
        (5, "en", "spam spam spam spam spam spam spam spam spam spam"),  # top-token
        (6, "en", "contact sales@example.com about the unique offer on "
                  "vintage telescopes and handmade brass instruments"),  # PII
        (7, "en", "benchmark sentence alpha beta gamma delta epsilon zeta "
                  "eta theta iota kappa entirely verbatim in the eval set"),  # contaminated
        (8, "en", "completely independent prose describing glacier fed "
                  "lakes and the migration patterns of arctic terns"),
    ]
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


def test_curation_pipeline_stages_and_outputs(spark, tmp_path):
    docs = _mk_docs(spark)
    eval_df = spark.createDataFrame(
        [(100, "benchmark sentence alpha beta gamma delta epsilon zeta eta "
               "theta iota kappa entirely verbatim in the eval set")],
        "doc_id long, text string",
    )
    out = str(tmp_path / "curated")
    report = curate_corpus(spark, docs, out, eval_df=eval_df)

    assert report["ingested"] == 8
    # 4 (short) and 5 (repetition) fall at quality
    assert report["after_quality"] == 6
    # 1,2,3 collapse to one canonical → lose 2
    assert report["after_dedup"] == 4
    # 7 is verbatim in the eval set → quarantined
    assert report["after_decontamination"] == 3

    docs_out = spark.read.parquet(f"{out}/documents")
    ids = {r["doc_id"] for r in docs_out.collect()}
    assert 7 not in ids and 4 not in ids and 5 not in ids
    assert len(ids & {1, 2, 3}) == 1  # one canonical survivor
    # PII scrubbed in place
    t6 = docs_out.filter(F.col("doc_id") == 6).collect()[0]["text"]
    assert "sales@example.com" not in t6 and "<email>" in t6
    # split column partitions the output and every row carries a label
    assert set(
        r["split"] for r in docs_out.select("split").distinct().collect()
    ) <= {"train", "val", "test"}

    chunks = spark.read.parquet(f"{out}/chunks")
    assert report["train_chunks"] == chunks.count()
    n_train = docs_out.filter(F.col("split") == "train").count()
    assert chunks.select("doc_id").distinct().count() == n_train

    # ingest-path z-order: the persisted cuts exist and the clustered
    # rewrite preserved the chunk set exactly
    import os

    assert os.path.exists(f"{out}/chunk_zorder_cuts.json")

    # packing stage: slices account for every train-chunk token exactly,
    # and the sequence count matches total_tokens / seq_len
    seqs = spark.read.parquet(f"{out}/sequences")
    total_tokens = chunks.agg(F.sum("n_chunk_tokens")).collect()[0][0]
    assert seqs.agg(F.sum("slice_len")).collect()[0][0] == total_tokens
    assert report["train_sequences"] == -(-total_tokens // 256)


def test_curation_pipeline_without_eval(spark, tmp_path):
    docs = _mk_docs(spark)
    report = curate_corpus(
        spark,
        docs,
        str(tmp_path / "c2"),
        cfg=CurationConfig(min_tokens=3),
    )
    assert "after_decontamination" not in report
    # the 2-token doc falls on min_tokens; the spam doc still falls on
    # its repetition ratios regardless of the relaxed token floor
    assert report["after_quality"] == 6


def test_curation_language_gate_and_bpe_counts(spark, tmp_path):
    """Optional stages: the trigram language gate drops the planted
    German doc; BPE training attaches real token counts consistent with
    a driver-side re-encode."""
    rows = [
        (1, "en", GOOD),
        (2, "en", "completely independent prose describing glacier fed "
                  "lakes and the migration patterns of arctic terns"),
        (3, "de", "der alte mann sitzt auf der bank am wasser und denkt "
                  "über die vergangenen jahre nach während die kinder "
                  "auf den grünen feldern spielen"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    out = str(tmp_path / "curated_lang")
    cfg = CurationConfig(keep_langs=["en"], bpe_merges=30)
    report = curate_corpus(spark, docs, out, cfg=cfg)

    assert report["ingested"] == 3
    assert report["after_langid"] == 2  # German doc gated out

    written = spark.read.parquet(f"{out}/documents")
    got = {r["doc_id"]: r for r in written.collect()}
    assert set(got) == {1, 2}
    from etl_sentinel_imagery_spark.operators.bpe import (
        encode_word,
        train_bpe_distributed,
    )

    merges = train_bpe_distributed(docs.filter("doc_id != 3"), 30)
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    for doc_id, _, text in rows[:2]:
        want = sum(
            len(encode_word(w, ranks)) for w in text.lower().split(" ") if w
        )
        assert got[doc_id]["n_bpe_real"] == want


def test_curation_lm_perplexity_gate(spark, tmp_path):
    """Optional LM gate: the gibberish doc scores far above the fluent
    docs under the reference-trained bigram LM and is dropped."""
    from etl_sentinel_imagery_spark.operators.lm_score import (
        score_docs,
        train_bigram_lm,
    )

    fluent = [
        (1, "en", GOOD),
        (2, "en", "completely independent prose describing glacier fed "
                  "lakes and the migration patterns of arctic terns"),
    ]
    gibberish = (3, "en", "zxq qqv bnmp wrt klx vvx trz ppw qqn mzx lkj "
                          "vbn wer tyu iop asd")
    docs = spark.createDataFrame(
        fluent + [gibberish], "doc_id long, lang string, text string"
    )
    ref = spark.createDataFrame(fluent, "doc_id long, lang string, text string")
    lm = train_bigram_lm(ref)
    s = {r["doc_id"]: r["nll"] for r in score_docs(docs, lm).collect()}
    cut = (max(s[1], s[2]) + s[3]) / 2
    out = str(tmp_path / "curated_lm")
    report = curate_corpus(
        spark, docs, out, cfg=CurationConfig(lm_max_nll=cut), lm_ref=ref
    )
    assert report["after_lm_filter"] == 2
    written = spark.read.parquet(f"{out}/documents")
    assert {r["doc_id"] for r in written.collect()} == {1, 2}


def test_semantic_gate_drops_embedding_twin(spark, tmp_path):
    """semantic_threshold: the doc whose embedding is a near-twin of a
    lower-id doc is dropped; docs without embeddings pass through."""
    import numpy as np

    docs = _mk_docs(spark)
    rng = np.random.default_rng(3)
    base = rng.normal(size=16)
    other = rng.normal(size=16)
    emb_rows = [
        (6, base.tolist()),
        (8, (base + 0.01 * rng.normal(size=16)).tolist()),  # twin of 6
        (1, other.tolist()),
        # docs 2,3,7… have no embedding rows on purpose
    ]
    emb = spark.createDataFrame(
        emb_rows, "vec_id bigint, embedding array<double>"
    )
    out = str(tmp_path / "sem")
    report = curate_corpus(
        spark,
        docs,
        out,
        cfg=CurationConfig(semantic_threshold=0.95, semantic_n_clusters=1),
        embeddings=emb,
    )
    ids = {
        r["doc_id"] for r in spark.read.parquet(f"{out}/documents").collect()
    }
    assert 8 not in ids  # the higher-id twin dropped
    assert 6 in ids  # representative kept
    assert report["after_semantic_dedup"] == report["after_dedup"] - 1

    # misconfiguration is loud
    import pytest

    with pytest.raises(ValueError, match="embeddings"):
        curate_corpus(
            spark, docs, out, cfg=CurationConfig(semantic_threshold=0.9)
        )


def test_chunk_by_bpe_counts_real_tokens(spark, tmp_path):
    """chunk_by_bpe: chunk token counts are TRUE BPE encoding lengths
    (recomputable from the trained merges), within budget, and packing
    accounts for exactly those tokens."""
    from etl_sentinel_imagery_spark.operators.bpe import (
        encode_word,
        train_bpe_distributed,
    )

    docs = _mk_docs(spark)
    out = str(tmp_path / "bpe_chunks")
    cfg = CurationConfig(
        bpe_merges=25, chunk_by_bpe=True, chunk_tokens=12, pack_seq_len=16
    )
    report = curate_corpus(spark, docs, out, cfg=cfg)
    chunks = spark.read.parquet(f"{out}/chunks").collect()
    assert chunks
    # re-derive the merges the pipeline trained (same corpus, same cap)
    docs_out = spark.read.parquet(f"{out}/documents")
    canon_ids = [r["doc_id"] for r in docs_out.collect()]
    canon = docs.filter(F.col("doc_id").isin(canon_ids))
    # the pipeline scrubs PII before training — replicate
    from etl_sentinel_imagery_spark.functions.text import scrub_pii

    merges = train_bpe_distributed(
        canon.withColumn("text", scrub_pii(F.col("text"))), 25
    )
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    for r in chunks:
        true_n = sum(
            len(encode_word(w, ranks))
            for w in r["chunk_text"].split(" ")
            if w
        )
        assert r["n_chunk_tokens"] == true_n
        if len(r["chunk_text"].split(" ")) > 1:
            assert r["n_chunk_tokens"] <= 12
    seqs = spark.read.parquet(f"{out}/sequences")
    total = sum(r["n_chunk_tokens"] for r in chunks)
    assert seqs.agg(F.sum("slice_len")).collect()[0][0] == total
    assert report["train_chunks"] == len(chunks)

    # chunk_by_bpe without a tokenizer is loud
    import pytest

    with pytest.raises(ValueError, match="bpe_merges"):
        curate_corpus(
            spark, docs, out, cfg=CurationConfig(chunk_by_bpe=True)
        )


def test_supervised_quality_gate(spark, tmp_path):
    """quality_min_score: a classifier trained on good-vs-junk vocab
    drops exactly the planted junk doc; missing weights raise."""
    import numpy as np

    from etl_sentinel_imagery_spark.operators.classifier import (
        hash_features,
        train_logreg,
    )

    dim = 1 << 12
    junk = (
        "lottery winner click now free pills winner scam lottery claim "
        "your prize now free winner pills scam click here now again"
    )
    docs = _mk_docs(spark).union(
        spark.createDataFrame([(9, "en", junk)], "doc_id long, lang string, text string")
    )
    # labels: planted junk doc = 0, the clean long docs = 1
    train_rows = [(9, 0)] + [(i, 1) for i in (1, 2, 6, 8)]
    labels = spark.createDataFrame(train_rows, "doc_id long, label int")
    feats = hash_features(
        docs.join(labels.select("doc_id"), "doc_id", "left_semi"),
        dim=dim,
    )
    w = train_logreg(feats, labels, dim=dim, n_iter=30, lr=2.0)
    out = str(tmp_path / "qm")
    report = curate_corpus(
        spark,
        docs,
        out,
        cfg=CurationConfig(quality_min_score=0.5, quality_dim=dim),
        quality_weights=w,
    )
    ids = {
        r["doc_id"] for r in spark.read.parquet(f"{out}/documents").collect()
    }
    assert 9 not in ids  # the junk doc fell at the model gate
    assert 8 in ids
    assert report["after_quality_model"] < report["after_quality"]

    import pytest

    with pytest.raises(ValueError, match="quality_weights"):
        curate_corpus(
            spark, docs, out, cfg=CurationConfig(quality_min_score=0.5)
        )


def test_source_mix_stage(spark, tmp_path):
    """source_mix: per-source keep fractions apply deterministically
    before everything else, the report carries per-source counts, and
    a missing source column raises."""
    import pytest

    base = _mk_docs(spark)
    docs = base.withColumn(
        "source",
        F.when(F.col("doc_id") <= 4, F.lit("wiki")).otherwise(F.lit("crawl")),
    )
    out = str(tmp_path / "mix")
    report = curate_corpus(
        spark,
        docs,
        out,
        cfg=CurationConfig(source_mix={"wiki": 1.0, "crawl": 0.0}),
    )
    assert report["after_source_mix"] == 4  # every wiki doc, no crawl
    assert report["mix_by_source"] == {"wiki": 4}
    ids = {
        r["doc_id"] for r in spark.read.parquet(f"{out}/documents").collect()
    }
    assert ids <= {1, 2, 3, 4}

    with pytest.raises(ValueError, match="source"):
        curate_corpus(
            spark, base, out, cfg=CurationConfig(source_mix={"wiki": 1.0})
        )

    # determinism: same seed, same kept set at a fractional weight
    r1 = curate_corpus(
        spark, docs, str(tmp_path / "m1"),
        cfg=CurationConfig(source_mix={"wiki": 0.5, "crawl": 0.5}),
    )
    r2 = curate_corpus(
        spark, docs, str(tmp_path / "m2"),
        cfg=CurationConfig(source_mix={"wiki": 0.5, "crawl": 0.5}),
    )
    assert r1["after_source_mix"] == r2["after_source_mix"]


def test_line_dedup_stage_strips_boilerplate(spark, tmp_path):
    """The CCNet line pass removes the repeated banner line before
    quality filtering, so the surviving docs carry only their unique
    prose (and a doc that was ONLY boilerplate then falls at quality)."""
    banner = "subscribe to our newsletter today for exclusive updates"
    rows = [
        (1, "en", f"{banner}\n{GOOD}"),
        (2, "en", f"{banner}\ncompletely distinct body about alpine "
                  "meadows and the seasonal behaviour of marmots"),
        (3, "en", banner),  # nothing but boilerplate → dies at quality
    ]
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    out = str(tmp_path / "curated_lines")
    report = curate_corpus(
        spark,
        docs,
        out,
        cfg=CurationConfig(line_dedup_min_count=2),
    )
    assert report["after_line_dedup"] == 3  # rows survive, text shrinks
    assert report["after_quality"] == 2  # doc 3 now empty → dropped
    texts = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{out}/documents").collect()
    }
    assert banner not in texts[1] and texts[1].startswith("the quick")
    assert banner not in texts[2]


def test_monitor_sketches_report_and_mergeability(spark, tmp_path):
    """monitor_cols: the report carries distinct estimates + heavy
    hitters per stage, the persisted rows are mergeable across runs
    (element-wise HLL max / CM add reproduce the two-run union)."""
    from etl_sentinel_imagery_spark.operators.sketches import (
        cm_estimate,
        cm_merge_agg,
        hll_estimate,
        hll_merge_agg,
    )

    docs = _mk_docs(spark).withColumn(
        "source",
        F.when(F.col("doc_id") <= 6, "crawl").otherwise("wiki"),
    )
    out = str(tmp_path / "curated_mon")
    cfg = CurationConfig(monitor_cols=["source"], monitor_cm_w=64)
    report = curate_corpus(spark, docs, out, cfg=cfg)

    mon = report["monitor"]
    ing = mon[("ingested", "source")]
    fin = mon[("final", "source")]
    # 2 distinct sources, exactly — HLL is exact at this cardinality
    assert round(ing["distinct_est"]) == 2
    assert ing["top"]["crawl"] == 6 and ing["top"]["wiki"] == 2
    assert ing["off"] == 0
    assert fin["top"].get("crawl", 0) < 6  # curation removed crawl docs

    # second run appends; read-time merge must equal the union
    curate_corpus(spark, docs, out, cfg=cfg, collect_stats=False)
    rows = spark.read.parquet(f"{out}/monitor").filter(
        "stage = 'ingested'"
    )
    assert rows.count() == 2
    merged = rows.groupBy("col").agg(
        hll_merge_agg("hll").alias("hll"),
        cm_merge_agg("cm", w=cfg.monitor_cm_w).alias("cm"),
    )
    got = merged.select(
        hll_estimate("hll").alias("d"),
        cm_estimate(
            F.col("cm"), F.lit("crawl"), w=cfg.monitor_cm_w
        ).alias("crawl_est"),
    ).collect()[0]
    assert round(got["d"]) == 2  # distinct merges by max, not add
    assert got["crawl_est"] >= 12  # counts merge additively (6 + 6)


def test_max_docs_cap_uniform_and_weighted(spark, tmp_path):
    from etl_sentinel_imagery_spark.operators.sampling import (
        sample_exact_n,
    )

    docs = spark.createDataFrame(
        [
            (i, "en",
             f"wholly unique document number {i} about topic {i} with "
             f"plenty of ordinary prose words to pass every quality gate",
             float(50 if i < 5 else 1))
            for i in range(40)
        ],
        "doc_id long, lang string, text string, q double",
    )
    out = str(tmp_path / "capped")
    report = curate_corpus(
        spark, docs, out, cfg=CurationConfig(max_docs=10)
    )
    assert report["after_cap"] == 10
    kept = {
        r["doc_id"]
        for r in spark.read.parquet(f"{out}/documents").collect()
    }
    assert len(kept) == 10
    # the cap is the documented deterministic hash-rank sample
    want = {
        r["doc_id"]
        for r in sample_exact_n(
            docs, 10, key_col="doc_id", seed="curate:cap"
        ).collect()
    }
    assert kept == want

    out2 = str(tmp_path / "capped_w")
    curate_corpus(
        spark,
        docs,
        out2,
        cfg=CurationConfig(max_docs=10, max_docs_weight_col="q"),
        collect_stats=False,
    )
    kept_w = {
        r["doc_id"]
        for r in spark.read.parquet(f"{out2}/documents").collect()
    }
    # the 5 heavy docs carry 250/285 of the weight: all should make a
    # 10-slot budget (overwhelmingly)
    assert {0, 1, 2, 3, 4} <= kept_w


def test_mix_temperature_stage(spark, tmp_path):
    """mix_temperature: keep fractions DERIVE from per-source counts
    ((n_min/n_i)^(1-alpha)); the report carries them; alpha=1 keeps
    natural proportions; mutually exclusive with source_mix."""
    import pytest

    base = _mk_docs(spark)
    docs = base.withColumn(
        "source",
        F.when(F.col("doc_id") <= 2, F.lit("small")).otherwise(
            F.lit("big")
        ),
    )
    out = str(tmp_path / "tmix")
    report = curate_corpus(
        spark, docs, out, cfg=CurationConfig(mix_temperature=0.0)
    )
    # alpha=0: uniform shares — the binding small source keeps 100%
    assert report["mix_fractions"]["small"] == 1.0
    assert 0 < report["mix_fractions"]["big"] < 1.0
    assert report["mix_by_source"]["small"] == 2

    r1 = curate_corpus(
        spark,
        docs,
        str(tmp_path / "t1"),
        cfg=CurationConfig(mix_temperature=1.0),
    )
    assert r1["after_source_mix"] == r1["ingested"]  # nothing dropped

    with pytest.raises(ValueError, match="not both"):
        curate_corpus(
            spark,
            docs,
            out,
            cfg=CurationConfig(
                mix_temperature=0.5, source_mix={"small": 1.0}
            ),
        )


def test_token_budget_stage(spark, tmp_path):
    """max_tokens: the post-curation corpus is capped by TOKEN budget
    — kept docs' token total crosses the budget by at most one doc,
    the selection is reproducible, and the report records the stage."""
    from etl_sentinel_imagery_spark.plans.corpus_pipeline import (
        CurationConfig,
        curate_corpus,
    )

    docs = spark.range(60).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.transform(
                F.sequence(
                    F.lit(0), (F.col("id") % 5 + 2).cast("int")
                ),
                lambda i: F.concat(
                    F.lit("w"),
                    F.col("id").cast("string"),
                    F.lit("x"),
                    i.cast("string"),
                ),
            ),
        ).alias("text"),
    )
    out = str(tmp_path / "out")
    report = curate_corpus(
        spark, docs, out,
        cfg=CurationConfig(max_tokens=100, min_tokens=1),
    )
    kept = spark.read.parquet(f"{out}/documents")
    from etl_sentinel_imagery_spark.functions.text import tokens as _t

    total = sum(
        r[0] for r in kept.select(F.size(_t(F.col("text")))).collect()
    )
    assert 100 <= total < 100 + 7  # crossing doc only
    assert report["after_token_budget"] == kept.count()
    # reproducible
    out2 = str(tmp_path / "out2")
    curate_corpus(
        spark, docs, out2,
        cfg=CurationConfig(max_tokens=100, min_tokens=1),
    )
    a = {r["doc_id"] for r in kept.collect()}
    b = {
        r["doc_id"]
        for r in spark.read.parquet(f"{out2}/documents").collect()
    }
    assert a == b
