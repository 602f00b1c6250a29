"""Deduplication operators for large-scale document pipelines.

Four tiers, all expressed with built-in Spark expressions (JVM-side, whole
-stage codegen — no Python in the hot path), each scaling differently:

- exact: md5 content hash → groupBy. One shuffle on the hash; at 100 TB
  the hash groupBy is the canonical map-side-combinable dedup.
- MinHash + LSH: per-doc integer signatures (narrow, no shuffle), then a
  band-bucket self-join — the shuffle is on (band, band_key), whose
  cardinality ≈ corpus size × n_bands, NOT the quadratic pair space.
- SimHash: one 16-bit locality-sensitive fingerprint per doc; near-dup
  candidates share the fingerprint (single groupBy).
- n-gram Jaccard: exact verification on candidate pairs (or, small-scale,
  a gram-explode self-join).

Hashing uses the engine-portable polynomial hash (functions.text) so the
DuckDB oracle can reproduce every signature bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from etl_sentinel_imagery_spark.functions.text import (
    HASH_MOD,
    polyhash,
    tokens,
    word_ngrams,
)

#: Universal-hash parameters for the MinHash permutations (a*h + b) mod p.
N_PERM = 8
BAND_SIZE = 2
MINHASH_A = [2 * p + 3 for p in range(N_PERM)]
MINHASH_B = [97 * p + 11 for p in range(N_PERM)]

#: LSH bucket-size cap. A bucket of n docs contributes n·(n-1)/2 candidate
#: pairs — one boilerplate mega-bucket (every shingle-identical doc in the
#: corpus) re-enters the quadratic regime the banding exists to avoid. A
#: bucket larger than the cap carries no ranking information anyway (its
#: members are wholesale near-identical; exact dedup or a canonical-pick
#: handles them), so it is dropped from pair generation.
MAX_BUCKET = 64

SIMHASH_BITS = 16


def exact_dedup_groups(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact duplicate groups by md5 content hash (canonical = min id)."""
    return (
        df.select(F.col(id_col), F.md5(F.col(text_col)).alias("content_hash"))
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def token_hashes(text_col: Column | str) -> Column:
    """Distinct-token integer hashes for a document (set semantics)."""
    col = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.transform(F.array_distinct(tokens(col)), polyhash)


SHINGLE_N = 3


def shingle_hashes(text_col: Column | str, n: int = SHINGLE_N) -> Column:
    """Distinct word-n-gram shingle hashes — the MinHash feature set.

    Shingles (not unigrams) are the right feature for near-dup detection:
    over a small shared vocabulary, unigram token sets of unrelated docs
    overlap almost completely, and LSH degenerates to the quadratic pair
    space. Word n-grams keep the feature space large enough that bucket
    collisions track true Jaccard similarity."""
    col = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.transform(word_ngrams(col, n), polyhash)


def minhash_signature(text_col: Column | str, n_perm: int = N_PERM) -> Column:
    """MinHash signature over 3-gram shingles: per permutation p, min over
    shingles of (a_p*h + b_p) mod 2^31-1. Empty docs get sentinel HASH_MOD.

    The shingle-hash array is bound ONCE through a higher-order-function
    lambda variable (transform over a one-element wrapper array) before
    the 8 permutation mins read it. Referencing the raw expression from
    each permutation instead would inline the whole tokenize+shingle+
    char-fold pipeline 8× per row — measured 1.7 s vs 0.6 s for the
    signature projection over the sf0.1 corpus."""

    def _perm(a: int, b: int):
        # NB: a plain `lambda h, a=a, b=b:` would NOT work — pyspark reads
        # the lambda's arity to decide the higher-order-function shape, and
        # default args count as parameters.
        return lambda h: (h * F.lit(a) + F.lit(b)) % F.lit(HASH_MOD)

    def _sig(hashes: Column) -> Column:
        return F.array(
            *[
                F.coalesce(
                    F.array_min(
                        F.transform(hashes, _perm(MINHASH_A[p], MINHASH_B[p]))
                    ),
                    F.lit(HASH_MOD).cast("long"),
                )
                for p in range(n_perm)
            ]
        )

    return F.element_at(
        F.transform(F.array(shingle_hashes(text_col)), _sig), 1
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_perm: int = N_PERM,
    band_size: int = BAND_SIZE,
    max_bucket: int | None = MAX_BUCKET,
    observation=None,
    sigs: DataFrame | None = None,
) -> DataFrame:
    """LSH candidate pairs: band the signature, bucket-join within bands.

    Scale path: the self-join key is (band_idx, band_key); bucket sizes are
    bounded by collision rate, so the shuffle stays linear in corpus size.
    Buckets larger than ``max_bucket`` are dropped before the self-join
    (the quadratic-regime guard — see MAX_BUCKET; ``None`` disables). The
    bucket count runs as a window over the SAME (band_idx, band_key) key
    the join shuffles on, so Catalyst reuses one exchange for both.
    Output: (id_a < id_b, n_shared_bands).

    Pass a ``pyspark.sql.Observation`` as ``observation`` to get cap
    accounting piggybacked on the job itself (CollectMetrics — no extra
    action): ``band_rows`` (total), ``dropped_band_rows`` (rows in
    over-cap buckets; silently-dropped work made visible), and
    ``largest_dropped_bucket`` (worst offender's size). At 100 TB this
    is the dashboard signal that a boilerplate mega-bucket was skipped
    and must be handled by the exact-dedup tier instead.

    ``sigs``: optionally pass a precomputed ``(doc, sig)`` signature
    table (the :func:`minhash_signature` projection, e.g. an already-
    checkpointed one) so callers that need signatures for their own
    purposes — incremental dedup probes both cluster and verify on
    them — don't pay the CPU-bound MinHash pipeline twice (round 12).
    """
    n_bands = n_perm // band_size

    def _band_structs(sig: Column) -> Column:
        return F.array(
            *[
                F.struct(
                    F.lit(b).alias("band_idx"),
                    F.concat_ws(
                        "_",
                        *[
                            F.element_at(sig, b * band_size + i + 1)
                            for i in range(band_size)
                        ],
                    ).alias("band_key"),
                )
                for b in range(n_bands)
            ]
        )

    if sigs is None:
        # ONE exchange (round 12): the repartition spreads the
        # CPU-bound shingle hashing across cores even when the source
        # is a single parquet split. The doc-keyed SECOND exchange the
        # old shape paid existed only as a materialization barrier —
        # without one, projection collapse inlines the full MinHash
        # expression into each band key and recomputes it 2×n_bands
        # times per doc. Binding the signature array through a
        # higher-order-function lambda variable gives the same
        # compute-once guarantee INSIDE one projection (a lambda
        # variable is evaluated once per element — the same idiom
        # minhash_signature itself uses for the shingle array), so the
        # barrier exchange — a corpus-sized shuffle of (doc, sig) at
        # 100 TB — disappears while staying deterministic and
        # fault-tolerant (no checkpoint).
        par = df.sparkSession.sparkContext.defaultParallelism
        bands = df.repartition(par).select(
            F.col(id_col).alias("doc"),
            F.explode(
                F.element_at(
                    F.transform(
                        F.array(minhash_signature(text_col, n_perm)),
                        _band_structs,
                    ),
                    1,
                )
            ).alias("band"),
        ).select("doc", "band.band_idx", "band.band_key")
    else:
        bands = sigs.select(
            "doc",
            F.explode(_band_structs(F.col("sig"))).alias("band"),
        ).select("doc", "band.band_idx", "band.band_key")
    if max_bucket is not None:
        w = Window.partitionBy("band_idx", "band_key")
        bands = bands.withColumn("bucket_n", F.count(F.lit(1)).over(w))
        if observation is not None:
            over = F.col("bucket_n") > max_bucket
            bands = bands.observe(
                observation,
                F.count(F.lit(1)).alias("band_rows"),
                F.sum(over.cast("long")).alias("dropped_band_rows"),
                F.max(F.when(over, F.col("bucket_n"))).alias(
                    "largest_dropped_bucket"
                ),
            )
        bands = bands.filter(F.col("bucket_n") <= max_bucket).drop("bucket_n")
        if observation is not None:
            # the self-join below references `bands` twice; a duplicated
            # CollectMetrics node breaks Observation.get, so materialize
            # once (eager) — the observation completes on this job and
            # the join reads the checkpoint instead of recomputing the
            # signature pipeline per side
            bands = bands.localCheckpoint()
    # merge (sort-merge) hint: the band table is CORPUS-sized, and
    # without a hint AQE happily broadcasts it once its estimate slips
    # under the threshold — the anti-scale plan (measured: a 200k-doc
    # stress run OOMed the driver building that broadcast). The r2 fix
    # pinned shuffle_hash, which merely moved the OOM out one order of
    # magnitude: at 1M docs the per-partition ShuffledHashJoin build map
    # (corpus × bands / n_partitions rows) stopped fitting (measured:
    # SparkOutOfMemoryError "not enough memory to build hash map").
    # Sort-merge is the only strategy of the three that SPILLS — the
    # correct fact-fact default at any scale.
    left = bands.alias("l").hint("merge")
    right = bands.alias("r")
    return (
        left.join(
            right,
            (F.col("l.band_idx") == F.col("r.band_idx"))
            & (F.col("l.band_key") == F.col("r.band_key"))
            & (F.col("l.doc") < F.col("r.doc")),
        )
        .groupBy(
            F.col("l.doc").alias("id_a"),
            F.col("r.doc").alias("id_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_shared_bands"))
    )


def jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact word-n-gram Jaccard similarity pairs ≥ threshold.

    Gram-explode self-join: shared-gram counting joins on the gram value,
    then |A∪B| = |A|+|B|-shared. The division is a single integer→double
    op, so the similarity value is cross-engine exact.

    (Round 13, measured and REJECTED: carrying each doc's gram count
    on every gram row through the self-join — to drop the sizes
    aggregate and its two pair-table joins — benched 2.2 s → 5.3 s at
    sf0.1: the n_grams projection re-inlines the whole ngram build
    beside the explode, and the wider rows slow the gram-keyed
    sort-merge more than the two tiny-broadcast joins cost. The sizes
    joins broadcast at runtime; keep this shape.)
    """
    par = df.sparkSession.sparkContext.defaultParallelism
    grams = df.repartition(par).select(
        F.col(id_col).alias("doc"),
        F.explode(word_ngrams(F.col(text_col), n)).alias("gram"),
    )
    sizes = grams.groupBy("doc").agg(F.count(F.lit(1)).alias("n_grams"))
    l, r = grams.alias("l"), grams.alias("r")
    shared = (
        l.join(r, (F.col("l.gram") == F.col("r.gram")) & (F.col("l.doc") < F.col("r.doc")))
        .groupBy(F.col("l.doc").alias("id_a"), F.col("r.doc").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    sa = sizes.select(F.col("doc").alias("id_a"), F.col("n_grams").alias("n_a"))
    sb = sizes.select(F.col("doc").alias("id_b"), F.col("n_grams").alias("n_b"))
    return (
        shared.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.col("n_shared").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("n_shared")),
        )
        .filter(F.col("jaccard") >= F.lit(threshold))
        .select("id_a", "id_b", "n_shared", "jaccard")
    )


def jaccard_verify_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    pairs: DataFrame,
    n: int = 3,
    threshold: float = 0.5,
    pairs_materialized: bool = False,
) -> DataFrame:
    """Exact word-n-gram Jaccard, verified ONLY on candidate ``pairs``
    (columns id_a < id_b) — the 100 TB companion of :func:`jaccard_pairs`.
    Pass ``pairs_materialized=True`` when ``pairs`` is already a
    checkpoint/materialized frame to skip the redundant re-checkpoint
    job (round 12).

    Scale shape: the corpus is semi-join-pruned to docs that appear in a
    candidate pair, each surviving doc computes its distinct-gram set once
    (narrow), and the pair relation joins the two gram sets BY DOC ID.
    Every shuffle key is a doc id — linear in the candidate set — so a
    stop-gram-like hot shingle cannot skew an exchange the way the
    gram-value self-join in :func:`jaccard_pairs` can. Intersection sizes
    come from `array_intersect` on the two bounded-size gram arrays.
    The division is the same single integer→double op, so similarity
    values stay cross-engine exact.
    """
    # `pairs` fans out three ways below (both cand-id branches + the
    # final join). Without a materialization barrier Spark recomputes the
    # entire candidate-generation lineage (e.g. the full MinHash-LSH
    # pipeline) once per branch — measured 3× the LSH cost at sf0.1.
    # localCheckpoint materializes the (tiny) pair set once, eagerly.
    if not pairs_materialized:
        pairs = pairs.localCheckpoint(eager=True)
    cand_ids = (
        pairs.select(F.col("id_a").alias("cid"))
        .union(pairs.select(F.col("id_b").alias("cid")))
        .distinct()
    )
    grams = df.join(
        cand_ids, df[id_col] == cand_ids["cid"], "left_semi"
    ).select(
        F.col(id_col).alias("doc"),
        word_ngrams(F.col(text_col), n).alias("grams"),
    )
    # merge hint on the gram-array sides: their rows carry whole
    # shingle arrays, so AQE's size estimate runs low and it tries to
    # BROADCAST a candidate-corpus-sized table (measured: OOMed the
    # driver at 200k docs); sort-merge keeps the id-keyed shuffle AND
    # spills if a partition's build side outgrows memory (the
    # shuffle_hash pin it replaces hit exactly that at 1M docs)
    ga = grams.select(
        F.col("doc").alias("id_a"), F.col("grams").alias("grams_a")
    ).hint("merge")
    gb = grams.select(
        F.col("doc").alias("id_b"), F.col("grams").alias("grams_b")
    ).hint("merge")
    shared = F.size(F.array_intersect("grams_a", "grams_b"))
    return (
        pairs.select("id_a", "id_b")
        .join(ga, "id_a")
        .join(gb, "id_b")
        .withColumn("n_shared", shared)
        .withColumn(
            "jaccard",
            F.col("n_shared").cast("double")
            / (F.size("grams_a") + F.size("grams_b") - F.col("n_shared")),
        )
        .filter(F.col("jaccard") >= F.lit(threshold))
        .select("id_a", "id_b", "n_shared", "jaccard")
    )


def simhash(text_col: Column | str, bits: int = SIMHASH_BITS) -> Column:
    """SimHash fingerprint: majority vote per bit over distinct-token
    hashes, folded into a `bits`-wide integer. Pure integer arithmetic."""
    hashes = token_hashes(text_col)

    def _bit_vote(j: int):
        return lambda acc, h: acc + (
            F.shiftright(h, j).bitwiseAND(F.lit(1)) * 2 - 1
        )

    weights = [
        F.aggregate(hashes, F.lit(0).cast("long"), _bit_vote(j))
        for j in range(bits)
    ]
    out = F.lit(0).cast("long")
    for j, w in enumerate(weights):
        out = out + F.when(w > 0, F.lit(1 << j)).otherwise(F.lit(0))
    return out


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 50,
) -> DataFrame:
    """Duplicate CLUSTERS from candidate pairs: connected components by
    iterative min-label propagation — the step that turns near-dup PAIRS
    into per-cluster canonical ids (keep min id, drop the rest).

    Each iteration is one join + one min-aggregate over the undirected
    edge list: label(v) ← min(label(v), min over neighbors of label(u)).
    Converges in O(diameter) rounds; dup clusters from LSH pairs are
    shallow (near-cliques), so 3-4 rounds is typical, but chain-shaped
    components need diameter rounds — hence RAISE (never return wrong
    labels silently) if max_iter passes without convergence. Labels are
    localCheckpointed every round (iterative lineage would otherwise
    grow unboundedly) and the superseded round's blocks are released.

    Returns (node, component) where component = min node id reachable.
    """
    edges = (
        pairs.select(F.col(id_a).alias("u"), F.col(id_b).alias("v"))
        .union(pairs.select(F.col(id_b).alias("u"), F.col(id_a).alias("v")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        edges.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges["v"] == labels["node"])
            .groupBy("u")
            .agg(F.min("component").alias("nbr_min"))
        )
        updated = (
            labels.join(neighbor_min, labels["node"] == neighbor_min["u"], "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce("nbr_min", F.col("component"))
                ).alias("component"),
                (
                    F.coalesce("nbr_min", F.col("component"))
                    < F.col("component")
                ).alias("_changed"),
            )
            .localCheckpoint(eager=True)
        )
        n_changed = updated.filter(F.col("_changed")).count()
        # release the superseded round's checkpoint blocks (best-effort:
        # the new checkpoint is already materialized)
        try:
            labels.rdd.unpersist(False)
        except Exception:
            pass
        labels = updated.drop("_changed")
        if n_changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds "
        f"({n_changed} labels still changing) — a component's diameter "
        "exceeds max_iter; raise max_iter"
    )


def dedup_clusters(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.5,
    sigs: DataFrame | None = None,
) -> DataFrame:
    """End-to-end near-dup clustering: exact-duplicate edges ∪ (LSH
    candidates → exact Jaccard verification) → connected components →
    (id, canonical_id, is_canonical). Docs in no cluster are their own
    canonical. The full 100 TB dedup recipe as one composition.

    The EXACT tier is load-bearing, not redundant: identical-content
    groups larger than MAX_BUCKET are deliberately dropped by the LSH
    bucket cap (the quadratic-regime guard), so without the hash-groupBy
    edges a 10k-copy boilerplate group would sail through unclustered —
    the cap's docstring defers exactly this case to exact dedup.

    ``sigs``: optional precomputed signature table, forwarded to
    :func:`minhash_lsh_pairs` (see its docstring)."""
    cands = minhash_lsh_pairs(df, id_col, text_col, sigs=sigs)
    verified = jaccard_verify_pairs(df, id_col, text_col, cands, threshold=threshold)
    # exact-duplicate edges: every copy → its group's min id. Linear
    # (one edge per duplicate row), immune to the bucket cap.
    hashed = df.select(F.col(id_col).alias("hid"), F.md5(F.col(text_col)).alias("h"))
    exact_edges = (
        hashed.withColumn(
            "c", F.min("hid").over(Window.partitionBy("h"))
        )
        .filter(F.col("hid") != F.col("c"))
        .select(F.col("c").alias("id_a"), F.col("hid").alias("id_b"))
    )
    all_edges = verified.select("id_a", "id_b").unionByName(exact_edges)
    # star contraction: round count is O(log n) regardless of how long
    # the transitive near-dup chains get
    comp = connected_components_star(all_edges)
    return (
        df.select(F.col(id_col).alias("id"))
        .join(comp, F.col("id") == comp["node"], "left")
        .select(
            "id",
            F.coalesce("component", F.col("id")).alias("canonical_id"),
        )
        .withColumn("is_canonical", F.col("id") == F.col("canonical_id"))
    )


#: Edge-count threshold below which components are solved driver-side.
#: 1M edges ≈ 16 MB of (long, long) — broadcast-scale data, where a
#: union-find beats ~5 distributed rounds of shuffle scheduling overhead
#: by an order of magnitude. Above it, star contraction runs as before.
SMALL_GRAPH_EDGES = 1_000_000


def _union_find_components(edges: list) -> list:
    """Driver-side union-find with path compression → (node, min-id-of-
    component) rows. Only called on graphs under SMALL_GRAPH_EDGES."""
    parent: dict = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[ru] = rv
    comp_min: dict = {}
    nodes = {u for u, _ in edges} | {v for _, v in edges}
    for n in nodes:
        r = find(n)
        m = comp_min.get(r)
        if m is None or n < m:
            comp_min[r] = n
    return [(n, comp_min[find(n)]) for n in nodes]


def connected_components_star(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 25,
    small_graph_edges: int | None = SMALL_GRAPH_EDGES,
) -> DataFrame:
    """Connected components via alternating large-star/small-star
    contraction (Kiveris et al., "Connected Components in MapReduce and
    Beyond" — public algorithm): converges in O(log n) rounds regardless
    of component DIAMETER, where min-label propagation
    (:func:`connected_components`) needs O(diameter) rounds and loses on
    chain-shaped components.

    large-star hangs every neighbor larger than the center onto the
    neighborhood minimum; small-star re-hangs the smaller neighbors.
    At the fixpoint the edge set IS the star (child → component-min).
    Each round's edge set is localCheckpointed (lineage stays flat) and
    compared by (count, hash-sum) checksum for convergence; the checksum
    rides the checkpoint job as a CollectMetrics observation, so each
    round is exactly one job.

    AQE-style runtime strategy pick: the initial dedup'd edge count is
    known after the first checkpoint, and a near-dup edge set is usually
    MUCH smaller than the corpus that produced it — below
    ``small_graph_edges`` the components are solved driver-side with a
    union-find on broadcast-scale data (≤ ~16 MB) instead of paying ~5
    shuffle rounds of scheduling overhead (measured 3.9 s → 0.2 s on a
    477-node graph at sf0.1). Pass ``small_graph_edges=None`` to force
    the distributed path (the 100 TB default shape; tests cross-check
    both against each other).
    """
    def bidir(e: DataFrame) -> DataFrame:
        return e.union(
            e.select(F.col("v").alias("u"), F.col("u").alias("v"))
        ).distinct()

    def large_star(eb: DataFrame) -> DataFrame:
        # merge: mins is |V|-sized — an AQE broadcast of it is the
        # same driver-OOM trap as the LSH band join, and a shuffled-hash
        # build map is the 1M-doc executor-OOM trap (see
        # minhash_lsh_pairs); sort-merge spills, so the u-keyed shuffle
        # join survives any |V|
        mins = eb.groupBy("u").agg(F.min("v").alias("mn")).hint("merge")
        m = F.least(F.col("mn"), F.col("u"))
        return (
            eb.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), m.alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )

    def small_star(eb: DataFrame) -> DataFrame:
        lt = eb.filter(F.col("v") < F.col("u"))
        mins = lt.groupBy("u").agg(F.min("v").alias("mn")).hint("merge")
        joined = lt.join(mins, "u")
        ev = (
            joined.filter(F.col("v") != F.col("mn"))
            .select(F.col("v").alias("u"), F.col("mn").alias("v"))
        )
        eu = mins.select("u", F.col("mn").alias("v"))
        return ev.union(eu).filter(F.col("u") != F.col("v")).distinct()

    def checksum(e: DataFrame) -> tuple:
        # hash-sum in decimal(38,0): a bigint SUM of xxhash64 values
        # overflows under ANSI mode
        row = e.agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(
                F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")),
                F.lit(0).cast("decimal(38,0)"),
            ).alias("h"),
        ).collect()[0]
        return (row["n"], row["h"])

    edges = (
        pairs.select(F.col(id_a).alias("u"), F.col(id_b).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    if small_graph_edges is not None:
        # limit(cap + 1).collect() probes smallness AND fetches the
        # edge list in one job (round 12 — the old shape paid a
        # checksum aggregation job first, then a second collect; one
        # overflow row proves bigness without materializing the rest)
        rows = edges.limit(small_graph_edges + 1).collect()
        if len(rows) <= small_graph_edges:
            from pyspark.sql.types import StructField, StructType

            node_type = edges.schema["u"].dataType
            out_schema = StructType(
                [
                    StructField("node", node_type),
                    StructField("component", node_type),
                ]
            )
            labeled = _union_find_components(
                [(r["u"], r["v"]) for r in rows]
            )
            return pairs.sparkSession.createDataFrame(labeled, out_schema)
    prev = checksum(edges)
    from pyspark.sql import Observation

    for _ in range(max_iter):
        obs = Observation()
        stepped = (
            small_star(bidir(large_star(bidir(edges))))
            .observe(
                obs,
                F.count(F.lit(1)).alias("n"),
                F.coalesce(
                    F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")),
                    F.lit(0).cast("decimal(38,0)"),
                ).alias("h"),
            )
            .localCheckpoint(eager=True)
        )
        m = obs.get
        cur = (m["n"], m["h"])
        try:
            edges.rdd.unpersist(False)
        except Exception:
            pass
        edges = stepped
        if cur == prev:
            # fixpoint: edges are (child, root) star edges
            children = edges.select(
                F.col("u").alias("node"), F.col("v").alias("component")
            )
            roots = (
                edges.select(F.col("v").alias("node"))
                .distinct()
                .join(children.select("node"), "node", "left_anti")
                .withColumn("component", F.col("node"))
            )
            return children.unionByName(roots)
        prev = cur
    raise RuntimeError(
        f"connected_components_star did not converge in {max_iter} rounds"
    )
