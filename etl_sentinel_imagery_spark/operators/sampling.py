"""Deterministic hash-based sampling, splitting, and source mixing.

The training-data operations a 100 TB pipeline runs constantly: carve a
train/val/test split, draw a repeatable sample, downsample sources to
target mixture weights. All of them are pure FILTERS on a deterministic
per-key hash — no shuffle, no RNG state, no driver coordination — so
they compose with predicate pushdown, run identically on 1 or 1000
executors, and re-running the pipeline yields byte-identical selections
(the property actual training reproducibility depends on).

The hash is the first 8 hex chars of md5(seed ∥ key) read as a uint32 —
chosen over xxhash64/rand because every engine in the parity loop can
state it exactly (DuckDB: ``CAST('0x' || substr(md5(..),1,8) AS
BIGINT)``), making sampled outputs oracle-checkable. md5 throughput is
not a bottleneck: one hash per ROW is orders of magnitude cheaper than
the per-token work around it.

No reference analog (the reference has no sampling layer); these are the
LLM-data-pipeline extensions SURVEY.md §2.10 calls for.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Hash space: 8 hex chars = 32 bits.
HASH_SPACE = 1 << 32


def hash_bucket(key: Column | str, seed: str = "") -> Column:
    """Deterministic uniform value in [0, 2^32) from md5(seed ∥ key)."""
    col = F.col(key) if isinstance(key, str) else key
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(seed), col.cast("string"))), 1, 8),
        16,
        10,
    ).cast("long")


def hash_bucket_sql(expr: str, seed: str = "") -> str:
    """DuckDB mirror of :func:`hash_bucket` over a SQL expression."""
    q = seed.replace("'", "''")
    return (
        f"CAST(('0x' || substr(md5('{q}' || CAST({expr} AS VARCHAR)), 1, 8))"
        f" AS BIGINT)"
    )


def _threshold(fraction: float) -> int:
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    return int(fraction * HASH_SPACE)


def hash_sample(
    df: DataFrame, key_col: str, fraction: float, seed: str = ""
) -> DataFrame:
    """Deterministic Bernoulli-by-key sample: keep rows whose bucket falls
    below fraction·2^32. Unlike ``df.sample`` this is repeatable across
    runs, engines, and partitionings, and keyed — every row of one key
    goes the same way, so sampling after an explode/join cannot split a
    logical record."""
    return df.filter(hash_bucket(key_col, seed) < F.lit(_threshold(fraction)))


def assign_split(
    key: Column | str,
    weights: dict[str, float],
    seed: str = "",
) -> Column:
    """Label each row 'train'/'val'/'test' (any names) by hash range.

    ``weights`` maps label → probability mass (must sum to ~1; the last
    label absorbs rounding). Insertion order defines the ranges, so the
    assignment is stable under re-runs and against the SQL mirror
    (:func:`assign_split_sql` iterates the same dict)."""
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total}")
    bucket = hash_bucket(key, seed)
    labels = list(weights)
    expr = None
    acc = 0.0
    for label in labels[:-1]:
        acc += weights[label]
        cond = bucket < F.lit(_threshold(acc))
        expr = F.when(cond, label) if expr is None else expr.when(cond, label)
    return (
        F.lit(labels[0]) if expr is None else expr.otherwise(F.lit(labels[-1]))
    )


def assign_split_sql(expr: str, weights: dict[str, float], seed: str = "") -> str:
    """DuckDB mirror of :func:`assign_split` (same cumulative thresholds)."""
    bucket = hash_bucket_sql(expr, seed)
    labels = list(weights)
    parts = []
    acc = 0.0
    for label in labels[:-1]:
        acc += weights[label]
        parts.append(f"WHEN {bucket} < {_threshold(acc)} THEN '{label}'")
    return "CASE " + " ".join(parts) + f" ELSE '{labels[-1]}' END"


def stratified_sample(
    df: DataFrame,
    key_col: str,
    stratum_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    seed: str = "",
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. keep 100% of high-quality
    docs, 10% of mid, 1% of boilerplate). The per-stratum threshold is a
    small CASE expression — no join, no shuffle; strata not listed get
    ``default_fraction``."""
    bucket = hash_bucket(key_col, seed)
    thr = F.lit(_threshold(default_fraction))
    for stratum, frac in fractions.items():
        thr = F.when(
            F.col(stratum_col) == stratum, F.lit(_threshold(frac))
        ).otherwise(thr)
    return df.filter(bucket < thr)


def weighted_mix(
    sources: dict[str, tuple[DataFrame, float]],
    key_col: str,
    seed: str = "",
) -> DataFrame:
    """Mix corpora to target weights: each source is hash-downsampled by
    its weight and tagged with its name (``mix_source`` column). Weights
    are KEEP FRACTIONS per source (a 100 TB mixing pass downsamples; it
    never upsamples — repeat epochs handle oversampling downstream).
    Schemas must match across sources."""
    out = None
    for name, (df, frac) in sources.items():
        part = hash_sample(df, key_col, frac, seed=f"{seed}:{name}").withColumn(
            "mix_source", F.lit(name)
        )
        out = part if out is None else out.unionByName(part)
    if out is None:
        raise ValueError("no sources given")
    return out


def upsample_epochs(
    df: DataFrame,
    epochs: float,
    key_col: str = "doc_id",
    seed: str = "",
    copy_col: str = "epoch_idx",
) -> DataFrame:
    """Deterministic OVERSAMPLING — the downstream half
    :func:`weighted_mix`'s docstring points at (rare high-quality
    domains repeat epochs; mixing itself only downsamples):
    ``floor(epochs)`` full copies of every row tagged ``copy_col``
    0..k-1, plus the fractional remainder as a hash-SELECTED partial
    epoch (the same md5 bucket as every sampler here — reproducible
    across runs, partitionings and engines; no RNG state). Rows
    missing the partial epoch simply stop at k-1 copies; with
    ``epochs < 1`` this degrades to :func:`hash_sample` plus the tag.

    A map-side ``explode`` over a per-row sequence — NO shuffle, so a
    100 TB corpus upsamples at scan speed. Downstream packing and
    shuffling should treat ``(key, copy_col)`` as the example id so
    repeated copies land in different batches."""
    if epochs <= 0:
        raise ValueError(f"epochs must be > 0, got {epochs}")
    k = int(epochs)
    frac = epochs - k
    extra = (
        F.when(
            hash_bucket(key_col, seed) < F.lit(_threshold(frac)),
            F.lit(1),
        ).otherwise(F.lit(0))
        if frac > 0
        else F.lit(0)
    )
    n_copies = F.lit(k) + extra
    seq = F.when(
        n_copies > 0, F.sequence(F.lit(0), n_copies - F.lit(1))
    ).otherwise(F.expr("array()").cast("array<int>"))
    return df.withColumn(copy_col, F.explode(seq))


def sample_exact_n(
    df: DataFrame, n: int, key_col: str = "doc_id", seed: str = ""
) -> DataFrame:
    """EXACTLY-n deterministic sample: the n rows with the smallest
    hash_bucket(key, seed) — the hash-rank analog of reservoir sampling
    with none of its RNG. Plans as TakeOrderedAndProject (per-partition
    top-n + driver merge, never a global sort), is reproducible across
    engines/cluster sizes like every sampler here, and is CONSISTENT
    under growth: a row leaves the sample only when a smaller-hash row
    arrives, so samples of n and n+m share n rows (nested samples —
    the property bootstrap/monitoring pipelines want). Ties are broken
    by the key itself (total order)."""
    key = F.col(key_col)
    return (
        df.orderBy(hash_bucket(key, seed).asc(), key.asc())
        .limit(n)
    )


def weighted_sample_exact_n(
    df: DataFrame,
    n: int,
    weight_col: str,
    key_col: str = "doc_id",
    seed: str = "",
) -> DataFrame:
    """EXACTLY-n weighted sampling WITHOUT replacement (Efraimidis &
    Spirakis 2006): each row draws u ∈ (0,1] from its deterministic
    md5 bucket and competes with the exponential key −ln(u)/w; the n
    SMALLEST keys are the sample, with inclusion probability
    proportional to weight at every prefix. The quality-weighted
    curation subsample (\"keep 1M docs, prefer high quality\") in one
    ``orderBy().limit()`` — TakeOrderedAndProject, never a global
    sort, no RNG state anywhere.

    Deterministic for a given ``seed`` across runs/partitionings (keys
    are pure functions of the row), and NESTED like
    :func:`sample_exact_n`: samples of n and n+m share n rows, because
    the keys don't change with n. Rows with weight ≤ 0 or NULL never
    enter the sample."""
    w = F.col(weight_col).cast("double")
    # (bucket + 1) / (HASH_SPACE + 1) ∈ (0, 1] — never 0, so ln is safe
    u = (hash_bucket(F.col(key_col), seed) + F.lit(1.0)) / F.lit(
        float(HASH_SPACE + 1)
    )
    es_key = -F.log(u) / w
    return (
        df.filter(w > 0)
        .orderBy(es_key.asc(), F.col(key_col).asc())
        .limit(n)
    )


def source_counts_strict(df: DataFrame, source_col: str) -> dict:
    """Per-source row counts (one control-plane-sized aggregation),
    RAISING on NULL sources — a temperature share is undefined for an
    unlabeled source, and silently dropping such rows loses data
    without a trace. Shared by :func:`temperature_mix` and the
    pipeline's ``mix_temperature`` stage (round-11 review: the check
    lived twice and would have drifted)."""
    rows = df.groupBy(source_col).count().collect()
    null_rows = sum(r[1] for r in rows if r[0] is None)
    if null_rows:
        raise ValueError(
            f"{null_rows} rows have NULL {source_col!r} — a "
            "temperature share is undefined for an unlabeled source; "
            "filter them out or fill the column before mixing"
        )
    return {r[0]: r[1] for r in rows}


def temperature_weights(
    counts: dict[str, float], alpha: float
) -> dict[str, float]:
    """Per-source KEEP FRACTIONS realizing temperature-``alpha``
    sampling (the multilingual/multi-corpus recipe: mT5 / XLM-R style
    ``p_i ∝ n_i^alpha`` — ``alpha=1`` keeps natural proportions,
    ``alpha→0`` flattens toward uniform, boosting small sources'
    SHARE). Downsample-only like :func:`weighted_mix`: the output is
    the LARGEST corpus whose source shares equal ``p`` without
    upsampling anyone — ``N = min_i n_i / p_i``, ``frac_i = N·p_i /
    n_i`` (the binding source keeps 100%; repeat small sources with
    :func:`upsample_epochs` downstream if you want a bigger N).
    Pure driver arithmetic over control-plane-sized count maps."""
    if not counts:
        raise ValueError("no sources")
    if any(n <= 0 for n in counts.values()):
        raise ValueError(f"non-positive source count in {counts}")
    if alpha < 0:
        raise ValueError(f"alpha must be >= 0, got {alpha}")
    p = {s: float(n) ** alpha for s, n in counts.items()}
    tot = sum(p.values())
    p = {s: v / tot for s, v in p.items()}
    n_out = min(counts[s] / p[s] for s in counts)
    return {s: min(1.0, n_out * p[s] / counts[s]) for s in counts}


def temperature_mix(
    df: DataFrame,
    source_col: str,
    key_col: str = "doc_id",
    alpha: float = 0.7,
    seed: str = "",
    report: dict | None = None,
) -> DataFrame:
    """Mix a multi-source corpus to temperature-``alpha`` shares in
    place: ONE count aggregation (control-plane-sized result — one row
    per source), :func:`temperature_weights` for the keep fractions,
    then the same per-row md5-threshold filter every sampler here
    uses. No join, no second shuffle, no RNG state — a 100 TB corpus
    mixes at scan speed after one count pass, deterministic across
    runs and partitionings.

    Rows with a NULL ``source_col`` RAISE: a temperature share is
    undefined for an unlabeled source, and silently dropping them
    (the pre-round-11 behavior) loses data without a trace — filter
    or fill the column first (round-10 advice, low).

    Pass a ``report`` dict for pipeline observability (the same shape
    ``curate_corpus`` records for explicit ``source_mix``): it is
    filled with ``source_counts`` (input rows per source),
    ``fractions`` (the derived keep fractions) and ``kept_by_source``
    (output rows per source — costs one extra count pass, only run
    when asked)."""
    counts = source_counts_strict(df, source_col)
    fracs = temperature_weights(counts, alpha)
    out = stratified_sample(
        df, key_col, source_col, fracs, default_fraction=0.0, seed=seed
    )
    if report is not None:
        report["source_counts"] = dict(counts)
        report["fractions"] = {s: round(fracs[s], 6) for s in counts}
        report["kept_by_source"] = {
            r[0]: r[1] for r in out.groupBy(source_col).count().collect()
        }
    return out


def sample_token_budget(
    df: DataFrame,
    budget_tokens: int,
    token_count: Column | str,
    key_col: str = "doc_id",
    seed: str = "",
    cum_col: str = "cum_before",
) -> DataFrame:
    """Deterministic TOKEN-BUDGET sampling — "give me a ~N-token
    corpus", the unit training actually budgets in, where every
    row-fraction sampler here would over/under-shoot on variable doc
    lengths. Rows are ranked by the same md5 hash as every sampler
    (uniform, reproducible, engine-portable), then the EXCLUSIVE
    prefix sum of ``token_count`` in hash order is computed and rows
    keep while it is `< budget_tokens` — so the selection is the
    hash-order prefix whose total first reaches the budget (the
    crossing doc included; totals land in
    [budget, budget + max_doc_tokens)). NESTED like
    :func:`sample_exact_n`: budgets N and N+M share the N-budget
    prefix exactly, because hash ranks don't change with the budget.

    Scale shape: the prefix sum is
    :func:`~etl_sentinel_imagery_spark.operators.packing.with_global_offset`'s
    two-phase range-partitioned sum — one range shuffle + a
    control-plane totals collect, never a single-task global window.
    Output carries ``cum_col`` (the exclusive prefix) for audit.

    ``budget_tokens`` ≤ 0 raises; ``token_count`` must be an integer
    column/expression (token counting itself is upstream — e.g.
    ``F.size(tokens(text))``)."""
    from etl_sentinel_imagery_spark.operators.packing import (
        with_global_offset,
    )

    if budget_tokens <= 0:
        raise ValueError(
            f"budget_tokens must be > 0, got {budget_tokens}"
        )
    tok = (
        F.col(token_count) if isinstance(token_count, str) else token_count
    )
    # unique sortable key: fixed-width (bucket, md5(key)) — both legs
    # are constant-width, so lexicographic string order == numeric
    # bucket order with a collision-free tiebreak for ANY key type.
    # The tiebreak is md5 of the stringified key, NOT lpad(key):
    # lpad truncates values past the pad width and mis-orders
    # '0'-prefix/'-' forms, so long string doc ids could collide and
    # break with_global_offset's unique-order requirement at the
    # budget boundary (round-11 advice, low). Distinct keys map to
    # distinct 128-bit digests (md5 collisions are the accepted
    # epsilon, same stance as every hash-keyed sampler here).
    ordk = F.concat(
        F.lpad(hash_bucket(key_col, seed).cast("string"), 10, "0"),
        F.lit(":"),
        F.md5(F.col(key_col).cast("string")),
    )
    staged = df.withColumn("_tok", tok.cast("long")).withColumn(
        "_ord", ordk
    )
    out = with_global_offset(staged, "_ord", "_tok", out_col=cum_col)
    return (
        out.filter(F.col(cum_col) < F.lit(int(budget_tokens)))
        .drop("_tok", "_ord")
    )


def stratified_token_budget(
    df: DataFrame,
    source_col: str,
    budgets: dict[str, int],
    token_count: Column | str,
    key_col: str = "doc_id",
    seed: str = "",
) -> DataFrame:
    """Per-source token budgets ("500M wiki + 2B crawl"), computed in
    ONE job (round 12 — the per-source loop ran a range shuffle plus
    a totals collect PER listed source, a 100-job plan for a
    100-source mixture spec): sources not listed are pruned, every
    source's hash-order prefix sum comes from a single
    :func:`~etl_sentinel_imagery_spark.operators.packing.with_grouped_offset`
    pass (range-partitioned on (source, order key), one control-plane
    totals collect), and each row keeps while its exclusive prefix is
    below ITS source's budget (tiny literal map lookup).

    Selection sets are BIT-IDENTICAL to the per-source loop: the
    per-source hash order is seed-scoped as ``md5(seed ∥ ':' ∥ source
    ∥ key)`` — exactly the string the loop's ``seed=f"{seed}:{src}"``
    produced — so sources still draw independent permutations and
    existing oracles/replays are unaffected."""
    if not budgets:
        raise ValueError("no sources given")
    for src, budget in budgets.items():
        if budget <= 0:
            raise ValueError(
                f"budget_tokens must be > 0, got {budget} for {src!r}"
            )
    from etl_sentinel_imagery_spark.operators.packing import (
        with_grouped_offset,
    )

    tok = (
        F.col(token_count) if isinstance(token_count, str) else token_count
    )
    src_c = F.col(source_col)
    bucket = hash_bucket(
        F.concat(src_c, F.col(key_col).cast("string")), seed=f"{seed}:"
    )
    ordk = F.concat(
        F.lpad(bucket.cast("string"), 10, "0"),
        F.lit(":"),
        F.md5(F.col(key_col).cast("string")),
    )
    staged = (
        df.filter(src_c.isin(list(budgets)))
        .withColumn("_tok", tok.cast("long"))
        .withColumn("_ord", ordk)
    )
    out = with_grouped_offset(
        staged, [source_col], "_ord", "_tok", out_col="cum_before"
    )
    bmap = F.create_map(
        *[
            x
            for s, b in budgets.items()
            for x in (F.lit(s), F.lit(int(b)))
        ]
    )
    return out.filter(F.col("cum_before") < bmap[src_c]).drop(
        "_tok", "_ord"
    )
