"""BPE trainer/encoder: the word-frequency factorization must be
EXACTLY equivalent to naive corpus-level training (the property that
justifies running only word counting at corpus scale), encoding must
invert to the original text, and token counts must be consistent."""

from __future__ import annotations

from etl_sentinel_imagery_spark.operators.bpe import (
    EOW,
    _symbols,
    bpe_encode,
    encode_word,
    train_bpe,
    train_bpe_distributed,
    word_freqs,
)
from etl_sentinel_imagery_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


# --- independent reference: naive corpus-level BPE (no word table) -------
def _naive_train(corpus_words: list, n_merges: int) -> list:
    """Textbook BPE over the raw token stream: count adjacent pairs over
    EVERY word occurrence (no frequency table), merge the best, repeat.
    Deliberately the dumbest correct formulation."""
    seqs = [list(_symbols(w)) for w in corpus_words if w]
    merges = []
    for _ in range(n_merges):
        pc: dict = {}
        for s in seqs:
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] = pc.get((s[i], s[i + 1]), 0) + 1
        if not pc:
            break
        best_count = max(pc.values())
        pair = min(p for p, c in pc.items() if c == best_count)
        merges.append(pair)
        for s in seqs:
            i = 0
            while i < len(s) - 1:
                if s[i] == pair[0] and s[i + 1] == pair[1]:
                    s[i : i + 2] = [s[i] + s[i + 1]]
                else:
                    i += 1
    return merges


CORPUS = (
    "the cat sat on the mat "
    "the bat sat on the cat "
    "a rat and the cat chat "
    "low lower lowest slow slower slowest "
    "new newer newest renew renewal"
).split()


def test_word_table_training_equals_naive_corpus_training():
    from collections import Counter

    freqs = list(Counter(CORPUS).items())
    got = train_bpe(freqs, n_merges=40)
    want = _naive_train(CORPUS, n_merges=40)
    assert got == want


def test_encode_roundtrip_and_greedy_rank_order():
    freqs = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    merges = train_bpe(freqs, n_merges=20)
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    for w, _ in freqs:
        toks = encode_word(w, ranks)
        # concatenation restores the word + end marker
        assert "".join(toks) == w + EOW
        # a fully-merged frequent word collapses to one token
    assert encode_word("newest", ranks) == ["newest" + EOW]
    # unseen word still encodes (falls back toward chars), lossless
    toks = encode_word("lowestest", ranks)
    assert "".join(toks) == "lowestest" + EOW and len(toks) >= 2


def test_spark_word_freqs_and_encode_consistent(spark):
    docs = load_table(spark, SF_DIR, "documents")
    wf = word_freqs(docs)
    # frequencies sum to the corpus token count
    import pyspark.sql.functions as F

    from etl_sentinel_imagery_spark.functions.text import tokens

    total = wf.agg(F.sum("freq")).collect()[0][0]
    direct = (
        docs.select(
            F.size(F.filter(tokens(F.lower(F.col("text"))), lambda t: t != ""))
            .alias("n")
        )
        .agg(F.sum("n"))
        .collect()[0][0]
    )
    assert total == direct

    merges = train_bpe_distributed(docs.limit(100), n_merges=60)
    assert len(merges) == 60
    enc = bpe_encode(docs.limit(100), merges)
    rows = enc.collect()
    assert len(rows) == 100
    for r in rows[:10]:
        assert r["n_bpe_tokens"] == len(r["bpe_tokens"])
        # lossless: stripping EOW and joining restores the whitespace-
        # collapsed lowercased text
        rebuilt = "".join(r["bpe_tokens"]).replace(EOW, " ").rstrip()
    # distributed encode agrees with driver-side encode_word per doc
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    doc0 = docs.limit(100).orderBy("doc_id").collect()[0]
    want: list = []
    for w in doc0["text"].lower().split(" "):
        if w:
            want.extend(encode_word(w, ranks))
    got = [r for r in rows if r["doc_id"] == doc0["doc_id"]][0]["bpe_tokens"]
    assert got == want


def test_tokenizer_artifact_roundtrip_and_pointer_commit(tmp_path):
    from etl_sentinel_imagery_spark.operators.bpe import (
        load_tokenizer,
        save_tokenizer,
    )

    merges = train_bpe([("low", 5), ("lower", 2), ("newest", 6)], 15)
    d = str(tmp_path / "tok")
    v1 = save_tokenizer(merges, d)
    assert load_tokenizer(d) == merges
    # content-addressed: identical tokenizer re-commit keeps the version
    assert save_tokenizer(merges, d) == v1
    # a new tokenizer commits a new version; the old stays loadable
    merges2 = train_bpe([("alpha", 3), ("beta", 2)], 10)
    v2 = save_tokenizer(merges2, d)
    assert v2 != v1
    assert load_tokenizer(d) == merges2
    assert load_tokenizer(d, version=v1) == merges


def test_heavy_tail_vocab_collect_is_bounded(spark):
    """Driver-safety on a heavy-tailed corpus: a few frequent words plus
    an unbounded junk tail (URL/hash-like uniques). The capped word
    table must be exactly max_vocab rows — the Zipf head, chosen
    deterministically — and training on it must match training on the
    true top-V table computed independently."""
    import pyspark.sql.functions as F

    from etl_sentinel_imagery_spark.operators.bpe import capped_word_freqs

    head = "alpha beta gamma delta epsilon".split()
    rows = []
    for i in range(400):
        junk = f"x{i:04d}hash{i * 7919 % 9973:04d}"  # unique per row
        rows.append((i, " ".join(head[: 1 + i % 5] * 3) + " " + junk))
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")

    capped = capped_word_freqs(docs, max_vocab=10)
    got = capped.collect()
    assert len(got) == 10  # bounded, though the corpus has 400+ words
    # independent top-V: full table sorted (freq desc, word asc)
    full = sorted(
        [(r["word"], r["freq"]) for r in word_freqs(docs).collect()],
        key=lambda t: (-t[1], t[0]),
    )
    assert sorted(
        [(r["word"], r["freq"]) for r in got], key=lambda t: (-t[1], t[0])
    ) == full[:10]

    # end-to-end: capped distributed training == driver training on the
    # independent top-V table
    merges = train_bpe_distributed(docs, n_merges=12, max_vocab=10)
    assert merges == train_bpe(full[:10], 12)

    # min_freq floor drops the junk tail entirely
    floored = capped_word_freqs(docs, min_freq=5, max_vocab=None)
    words = {r["word"] for r in floored.collect()}
    assert words <= set(head)
    assert "alpha" in words

    # a non-binding cap changes nothing (the exactness property holds)
    assert train_bpe_distributed(
        docs, n_merges=12, max_vocab=1_000_000
    ) == train_bpe_distributed(docs, n_merges=12, max_vocab=None)


def test_capped_topv_is_distributed_topk(spark):
    """The cap must plan as TakeOrderedAndProject (per-partition top-V +
    driver merge), never a single-partition global Sort."""
    import io
    from contextlib import redirect_stdout

    from etl_sentinel_imagery_spark.operators.bpe import capped_word_freqs

    docs = spark.createDataFrame(
        [(1, "a b c a b a")], "doc_id bigint, text string"
    )
    plan_buf = io.StringIO()
    with redirect_stdout(plan_buf):
        capped_word_freqs(docs, max_vocab=5).explain("formatted")
    plan = plan_buf.getvalue()
    assert "TakeOrderedAndProject" in plan, plan


def test_bpe_chunker_budget_exact_and_lossless(spark):
    """chunk_documents_bpe: every chunk's n_bpe_tokens is its TRUE BPE
    encoding length, chunks respect the budget except the documented
    single-oversized-word case, word boundaries are never split, and
    concatenating chunks restores the whitespace-collapsed text."""
    from etl_sentinel_imagery_spark.operators.bpe import chunk_documents_bpe

    docs_rows = [
        (1, "the cat sat on the mat " * 12),
        (2, "low lower lowest slow slower slowest " * 8),
        (3, "supercalifragilisticexpialidocious"),  # one giant word
        (4, ""),
        (5, "   "),
        (6, "single"),
    ]
    docs = spark.createDataFrame(docs_rows, "doc_id bigint, text string")
    merges = train_bpe_distributed(docs, n_merges=30)
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    budget = 20
    out = chunk_documents_bpe(docs, merges, chunk_tokens=budget).collect()
    by_doc: dict = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert 4 not in by_doc and 5 not in by_doc  # empty docs: no chunks
    for doc_id, text in docs_rows:
        if doc_id in (4, 5):
            continue
        chunks = sorted(by_doc[doc_id], key=lambda r: r["chunk_idx"])
        assert [r["chunk_idx"] for r in chunks] == list(range(len(chunks)))
        # lossless word-aligned reassembly
        rebuilt = " ".join(r["chunk_text"] for r in chunks)
        assert rebuilt == " ".join(text.lower().split())
        for r in chunks:
            # n_bpe_tokens is the TRUE encoding length of the chunk text
            true_n = sum(
                len(encode_word(w, ranks)) for w in r["chunk_text"].split(" ")
            )
            assert r["n_bpe_tokens"] == true_n
            if len(r["chunk_text"].split(" ")) > 1:
                assert r["n_bpe_tokens"] <= budget
        # greedy maximality: merging any adjacent pair would overflow
        for a, b in zip(chunks, chunks[1:]):
            first_next = b["chunk_text"].split(" ")[0]
            assert a["n_bpe_tokens"] + len(
                encode_word(first_next, ranks)
            ) > budget
