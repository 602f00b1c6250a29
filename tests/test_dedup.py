"""Dedup scale-path semantics: LSH bucket cap + candidate-verified Jaccard.

The registry query `docs_jaccard_pairs` runs the 100 TB shape (LSH
candidates → verify by doc id). These tests pin it to the small-scale
ground truth (all-pairs gram-explode Jaccard) and prove the MAX_BUCKET
guard actually bounds the pair space on a planted mega-bucket corpus.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_sentinel_imagery_spark.operators.dedup import (
    jaccard_pairs,
    jaccard_verify_pairs,
    minhash_lsh_pairs,
)
from etl_sentinel_imagery_spark.sources.tables import load_table
from tests.conftest import SF_DIR


def _pair_set(df):
    return {
        (r["id_a"], r["id_b"], r["n_shared"], round(r["jaccard"], 12))
        for r in df.collect()
    }


def test_candidate_verified_jaccard_matches_exact(spark):
    """On the test corpus, LSH recall at J>=0.5 is total: the candidate-
    verified path must reproduce the exact all-pairs result bit-for-bit
    (if LSH ever misses a true pair here, the permutation count — not
    this test — is what needs changing)."""
    docs = load_table(spark, SF_DIR, "documents")
    exact = _pair_set(jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.5))
    cands = minhash_lsh_pairs(docs, "doc_id", "text")
    verified = _pair_set(
        jaccard_verify_pairs(docs, "doc_id", "text", cands, n=3, threshold=0.5)
    )
    assert verified == exact
    assert exact, "fixture corpus has no Jaccard>=0.5 pairs — test is vacuous"


def test_bucket_cap_bounds_mega_bucket(spark):
    """A boilerplate corpus (N identical docs) collides into one bucket
    per band; uncapped, the self-join is N^2. With the cap, the mega
    bucket is dropped entirely and the planted distinct docs still pair
    normally."""
    n_boiler = 200
    boiler = spark.range(n_boiler).select(
        F.col("id").alias("doc_id"),
        F.lit("the same boilerplate footer text repeated verbatim always").alias(
            "text"
        ),
    )
    # two genuinely-similar docs that must survive the cap
    extra = spark.createDataFrame(
        [
            (10_001, "alpha beta gamma delta epsilon zeta eta theta"),
            (10_002, "alpha beta gamma delta epsilon zeta eta iota"),
        ],
        "doc_id long, text string",
    )
    docs = boiler.unionByName(extra)

    capped = minhash_lsh_pairs(docs, "doc_id", "text", max_bucket=64)
    pairs = capped.collect()
    # mega bucket dropped: none of the quadratic boilerplate pairs appear
    assert all(r["id_a"] >= 10_000 for r in pairs), pairs
    assert {(r["id_a"], r["id_b"]) for r in pairs} == {(10_001, 10_002)}

    uncapped = minhash_lsh_pairs(docs, "doc_id", "text", max_bucket=None)
    n_uncapped = uncapped.count()
    assert n_uncapped >= n_boiler * (n_boiler - 1) // 2


def test_connected_components_vs_union_find(spark):
    """Label propagation must agree with a driver-side union-find on a
    graph with chains, a clique, and singleton-free structure."""
    from etl_sentinel_imagery_spark.operators.dedup import connected_components

    edges = [
        (1, 2), (2, 3), (3, 4),          # chain → component 1
        (10, 11), (11, 12), (10, 12),    # triangle → component 10
        (20, 21),                        # pair → component 20
        (30, 31), (32, 31),              # V-shape → component 30
    ]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {
        (r["node"], r["component"])
        for r in connected_components(df).collect()
    }

    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {(n, find(n)) for n in parent}
    assert got == want


def test_dedup_clusters_end_to_end(spark):
    """Full recipe on the fixture corpus: every exact-duplicate group
    must land in one cluster with the min doc_id canonical."""
    from etl_sentinel_imagery_spark.operators.dedup import (
        dedup_clusters,
        exact_dedup_groups,
    )
    from etl_sentinel_imagery_spark.sources.tables import load_table
    from tests.conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents")
    clusters = {r["id"]: r["canonical_id"] for r in dedup_clusters(docs, "doc_id", "text").collect()}
    assert len(clusters) == docs.count()  # every doc labeled
    # exact duplicates (jaccard 1.0 ≥ threshold) must share a canonical
    for g in exact_dedup_groups(docs, "doc_id", "text").filter("n_copies > 1").collect():
        members = [i for i, c in clusters.items() if c == clusters[g["canonical_id"]]]
        assert g["canonical_id"] in members and len(members) >= g["n_copies"]
    # canonical really is the min of its cluster
    for i, c in clusters.items():
        assert c <= i


def test_pii_scrub_and_normalize(spark):
    """PII redaction + text normalization on crafted strings, and DuckDB
    agreement on the same strings (the engine-portability contract the
    text_profile oracle relies on)."""
    import duckdb

    from etl_sentinel_imagery_spark.functions.text import (
        PII_PATTERNS,
        count_pii,
        normalize_text,
        scrub_pii,
    )

    rows = [
        (1, "contact me at alice.smith+x@example.org or +33 1 23 45 67 89"),
        (2, "server 192.168.0.1 responded; no pii here otherwise"),
        (3, "MiXeD   Case\twith\ncontrol\x07chars  and   runs"),
        (4, "clean text"),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    got = {
        r["id"]: (r["scrubbed"], r["n_pii"], r["norm"])
        for r in df.select(
            "id",
            scrub_pii("text").alias("scrubbed"),
            count_pii("text").alias("n_pii"),
            normalize_text("text").alias("norm"),
        ).collect()
    }
    assert got[1][0] == "contact me at <email> or <phone>"
    assert got[1][1] == 2
    assert got[2][0] == "server <ipv4> responded; no pii here otherwise"
    assert got[2][1] == 1
    assert got[3][2] == "mixed case with control chars and runs"
    assert got[4] == ("clean text", 0, "clean text")

    # DuckDB mirror scrubs to the identical strings
    con = duckdb.connect()
    scrub_sql = "text"
    for name, pat in PII_PATTERNS.items():
        scrub_sql = f"regexp_replace({scrub_sql}, '{pat}', '<{name}>', 'g')"
    for rid, text in rows:
        (duck_scrub,) = con.execute(
            f"SELECT {scrub_sql} FROM (SELECT ? AS text)", [text]
        ).fetchone()
        assert duck_scrub == got[rid][0], (rid, duck_scrub, got[rid][0])
