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


def test_bucket_cap_drop_metrics_observation(spark):
    """The cap's drop accounting rides the job via CollectMetrics: an
    Observation passed to minhash_lsh_pairs reports total band rows,
    rows dropped in over-cap buckets, and the largest dropped bucket —
    with no extra action beyond the candidate-pair job itself."""
    from pyspark.sql import Observation

    from etl_sentinel_imagery_spark.operators.dedup import N_PERM, BAND_SIZE

    n_boiler = 200
    docs = spark.range(n_boiler).select(
        F.col("id").alias("doc_id"),
        F.lit("the same boilerplate footer text repeated verbatim always").alias(
            "text"
        ),
    )
    obs = Observation("lsh_cap")
    minhash_lsh_pairs(docs, "doc_id", "text", max_bucket=64, observation=obs).count()
    m = obs.get
    n_bands = N_PERM // BAND_SIZE
    # identical docs → every doc lands in one full bucket per band
    assert m["band_rows"] == n_boiler * n_bands
    assert m["dropped_band_rows"] == n_boiler * n_bands
    assert m["largest_dropped_bucket"] == n_boiler


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
    agreement via the PRODUCTION scrub SQL (the same string the
    text_profile oracle ships — not a test-local rebuild)."""
    import duckdb

    from etl_sentinel_imagery_spark.functions.text import (
        count_pii,
        normalize_text,
        scrub_pii,
    )
    from etl_sentinel_imagery_spark.queries.text_q import _SCRUB_SQL

    rows = [
        (1, "contact me at alice.smith+x@example.org or +33 1 23 45 67 89"),
        (2, "server 192.168.0.1 responded; no pii here otherwise"),
        (3, "MiXeD   Case\twith\ncontrol\x07chars  and   runs"),
        (4, "clean text"),
        (5, "Reach John.Smith@Company.ORG today"),      # mixed-case email
        (6, "updated 2024-01-01 12:34 by job 7"),       # date+time is NOT pii
        (7, "call 0612345789 now"),                     # bare >=9-digit run
        (8, "mail user@192.168.0.1.example"),           # overlap: email wins, counted once
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
    assert got[5][0] == "Reach <email> today" and got[5][1] == 1
    assert got[6][0] == "updated 2024-01-01 12:34 by job 7" and got[6][1] == 0
    assert got[7][0] == "call <phone> now" and got[7][1] == 1
    # the overlap span is redacted once and counted once
    assert got[8][0] == "mail <email>" and got[8][1] == 1

    # DuckDB's production scrub SQL produces the identical strings
    con = duckdb.connect()
    for rid, text in rows:
        (duck_scrub,) = con.execute(
            f"SELECT {_SCRUB_SQL} FROM (SELECT ? AS text)", [text]
        ).fetchone()
        assert duck_scrub == got[rid][0], (rid, duck_scrub, got[rid][0])


def test_dedup_clusters_mega_group_via_exact_tier(spark):
    """Identical-content groups LARGER than MAX_BUCKET are dropped by
    the LSH cap — the exact-dup edge tier must still collapse them to
    one canonical (review regression: previously every copy stayed
    'canonical')."""
    from etl_sentinel_imagery_spark.operators.dedup import dedup_clusters

    n_boiler = 200  # > MAX_BUCKET = 64
    boiler = spark.range(n_boiler).select(
        F.col("id").alias("doc_id"),
        F.lit("identical boilerplate footer text repeated verbatim").alias("text"),
    )
    distinct = spark.createDataFrame(
        [(10_001, "alpha beta gamma delta unique"), (10_002, "omega psi chi unique too")],
        "doc_id long, text string",
    )
    out = dedup_clusters(boiler.unionByName(distinct), "doc_id", "text")
    canon = {r["id"]: r["canonical_id"] for r in out.collect()}
    assert all(canon[i] == 0 for i in range(n_boiler))  # one cluster, min id
    assert canon[10_001] == 10_001 and canon[10_002] == 10_002
    assert out.filter("is_canonical").count() == 3


def test_connected_components_long_chain_and_nonconvergence(spark):
    """A 30-node chain needs ~29 rounds (diameter) — must converge under
    the default max_iter and RAISE, not silently mislabel, when capped
    below the diameter."""
    import pytest as _pytest

    from etl_sentinel_imagery_spark.operators.dedup import connected_components

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 30)], "id_a long, id_b long"
    )
    labels = {r["node"]: r["component"] for r in connected_components(chain).collect()}
    assert set(labels.values()) == {1} and len(labels) == 30

    with _pytest.raises(RuntimeError, match="did not converge"):
        connected_components(chain, max_iter=3)


def test_star_components_match_propagation(spark):
    """Alternating star contraction must produce the identical labeling
    as min-label propagation on mixed graph shapes, and converge on a
    long chain in far fewer rounds than the chain's diameter."""
    from etl_sentinel_imagery_spark.operators.dedup import (
        connected_components,
        connected_components_star,
    )

    edges = [
        (1, 2), (2, 3), (3, 4),
        (10, 11), (11, 12), (10, 12),
        (20, 21),
        (30, 31), (32, 31),
    ] + [(i, i + 1) for i in range(100, 130)]  # 31-node chain
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    # force the DISTRIBUTED star path (small_graph_edges=None): the
    # driver-side union-find shortcut must not be the only path tested
    star = {
        (r["node"], r["component"])
        for r in connected_components_star(df, small_graph_edges=None).collect()
    }
    prop = {
        (r["node"], r["component"])
        for r in connected_components(df).collect()
    }
    assert star == prop

    # the size-adaptive default (union-find under the threshold) must
    # produce the identical labeling as the distributed rounds
    hybrid = {
        (r["node"], r["component"])
        for r in connected_components_star(df).collect()
    }
    assert hybrid == star

    # diameter 30, star must converge well under 10 alternating rounds
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 31)], "id_a long, id_b long"
    )
    labels = {
        r["node"]: r["component"]
        for r in connected_components_star(
            chain, max_iter=10, small_graph_edges=None
        ).collect()
    }
    assert set(labels.values()) == {1} and len(labels) == 31
