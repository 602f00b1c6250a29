"""HLL sketch operator: merge exactness (the property pre-aggregation
relies on), estimate accuracy vs exact distinct, and the rollup shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_sentinel_imagery_spark.operators.sketches import (
    HLL_M,
    exact_error_bound,
    hll_estimate,
    hll_merge_agg,
    hll_sketch,
)
from etl_sentinel_imagery_spark.sources.tables import load_table
from tests.conftest import SF_DIR


def _est(spark, df, group_cols, key):
    sk = hll_sketch(df, group_cols, key)
    return sk, {
        tuple(r[c] for c in group_cols): r["est"]
        for r in sk.select(*group_cols, hll_estimate("hll").alias("est")).collect()
    }


def test_estimate_within_error_bound(spark):
    events = load_table(spark, SF_DIR, "events")
    exact = events.select("user_id").distinct().count()
    _, ests = _est(spark, events.withColumn("g", F.lit(1)), ["g"], "user_id")
    est = ests[(1,)]
    assert abs(est - exact) / exact < exact_error_bound(exact)


def test_merge_equals_whole_corpus_sketch_exactly(spark):
    """sketch(A ∪ B) must equal merge(sketch(A), sketch(B)) REGISTER FOR
    REGISTER — determinism of the hash makes this an equality, not an
    approximation."""
    events = load_table(spark, SF_DIR, "events").withColumn("g", F.lit(1))
    a = events.filter(F.col("event_id") % 2 == 0)
    b = events.filter(F.col("event_id") % 2 == 1)
    whole = hll_sketch(events, ["g"], "user_id").collect()[0]["hll"]
    shards = hll_sketch(a, ["g"], "user_id").unionByName(
        hll_sketch(b, ["g"], "user_id")
    )
    merged = (
        shards.groupBy("g")
        .agg(hll_merge_agg("hll").alias("hll"))
        .collect()[0]["hll"]
    )
    assert list(merged) == list(whole)
    assert len(whole) == HLL_M


def test_rollup_pattern_day_to_range(spark):
    """Daily sketches merged over a date range match the sketch built
    directly on that range (the no-rescan rollup guarantee)."""
    events = load_table(spark, SF_DIR, "events").withColumn(
        "day", F.to_date("ts")
    )
    daily = hll_sketch(events, ["day"], "user_id")
    days = sorted(r["day"] for r in daily.select("day").distinct().collect())
    assert len(days) >= 2
    lo, hi = days[0], days[len(days) // 2]
    merged = (
        daily.filter((F.col("day") >= lo) & (F.col("day") <= hi))
        .groupBy()
        .agg(hll_merge_agg("hll").alias("hll"))
        .select(hll_estimate("hll").alias("est"))
        .collect()[0]["est"]
    )
    direct_df = events.filter((F.col("day") >= lo) & (F.col("day") <= hi))
    direct = (
        hll_sketch(direct_df.withColumn("g", F.lit(1)), ["g"], "user_id")
        .select(hll_estimate("hll").alias("est"))
        .collect()[0]["est"]
    )
    assert merged == direct  # same registers → identical estimate
    exact = direct_df.select("user_id").distinct().count()
    assert abs(merged - exact) / exact < exact_error_bound(exact)


def test_sketches_survive_parquet_roundtrip(spark, tmp_path):
    """The persistence story: write sketch rows, read them back, merge —
    byte-stable registers through the parquet boundary."""
    events = load_table(spark, SF_DIR, "events").withColumn(
        "day", F.to_date("ts")
    )
    daily = hll_sketch(events, ["day"], "user_id")
    p = str(tmp_path / "sketches")
    daily.write.parquet(p)
    back = spark.read.parquet(p)
    a = {str(r["day"]): list(r["hll"]) for r in daily.collect()}
    b = {str(r["day"]): list(r["hll"]) for r in back.collect()}
    assert a == b

# --- sparse HLL ----------------------------------------------------------


def test_sparse_matches_dense_register_for_register(spark):
    """Sparse map == dense array minus zeros, at default and non-default
    precision; estimates from either representation are identical."""
    from etl_sentinel_imagery_spark.operators.sketches import (
        hll_estimate_sparse,
        hll_sketch_sparse,
        hll_sparse_to_dense,
    )

    events = load_table(spark, SF_DIR, "events").withColumn("g", F.lit(1))
    for p in (6, 9):
        dense = hll_sketch(events, ["g"], "user_id", p=p).collect()[0]["hll"]
        row = (
            hll_sketch_sparse(events, ["g"], "user_id", p=p)
            .select(
                "hll",
                hll_sparse_to_dense("hll", p=p).alias("densified"),
                hll_estimate_sparse("hll", p=p).alias("est"),
            )
            .collect()[0]
        )
        assert list(row["densified"]) == list(dense)
        assert dict(row["hll"]) == {
            i: r for i, r in enumerate(dense) if r > 0
        }
        dense_est = (
            hll_sketch(events, ["g"], "user_id", p=p)
            .select(hll_estimate("hll", p=p).alias("est"))
            .collect()[0]["est"]
        )
        # equal within float tolerance, not bit-for-bit: the sparse fold
        # adds the zeros term first then registers in index order, while
        # the dense fold interleaves 1.0 terms at the zero positions
        assert row["est"] == pytest.approx(dense_est, rel=1e-12)


def test_sparse_merge_exact_and_smaller_on_fine_grains(spark):
    """Merged sparse shards == whole-corpus sparse sketch, and per-day
    sparse sketches store far fewer than m entries (the storage win)."""
    from etl_sentinel_imagery_spark.operators.sketches import (
        hll_sketch_sparse,
        hll_sparse_merge_agg,
    )

    events = load_table(spark, SF_DIR, "events").withColumn(
        "day", F.to_date("ts")
    ).withColumn("g", F.lit(1))
    whole = hll_sketch_sparse(events, ["g"], "user_id").collect()[0]["hll"]
    daily = hll_sketch_sparse(events, ["day"], "user_id")
    merged = (
        daily.groupBy()
        .agg(hll_sparse_merge_agg("hll").alias("hll"))
        .collect()[0]["hll"]
    )
    assert dict(merged) == dict(whole)
    sizes = [len(r["hll"]) for r in daily.collect()]
    assert max(sizes) < HLL_M  # fine grains stay sparse


def test_precision_dial(spark):
    """Higher p -> more registers and a within-bound estimate at p=12."""
    from etl_sentinel_imagery_spark.operators.sketches import hll_sketch as hs

    events = load_table(spark, SF_DIR, "events").withColumn("g", F.lit(1))
    exact = events.select("user_id").distinct().count()
    for p in (6, 12):
        sk = hs(events, ["g"], "user_id", p=p)
        row = sk.select(hll_estimate("hll", p=p).alias("est")).collect()[0]
        assert len(sk.collect()[0]["hll"]) == 1 << p
        assert abs(row["est"] - exact) / exact < exact_error_bound(exact, p=p)


# --- top-k heavy hitters -------------------------------------------------


def test_topk_exact_when_k_covers_domain(spark):
    """k >= #distinct items -> the sketch IS the exact count map, off=0."""
    from etl_sentinel_imagery_spark.operators.sketches import topk_sketch

    orders = load_table(spark, SF_DIR, "orders")
    sk = topk_sketch(orders, [], "o_orderpriority", k=10).collect()[0]
    exact = {
        r["o_orderpriority"]: r["cnt"]
        for r in orders.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    assert dict(sk["items"]) == exact
    assert sk["off"] == 0


def test_topk_truncation_bounds_and_merge(spark):
    """Truncated sketches keep the Mergeable-Summaries bounds through a
    merge: stored estimates bracket the true count within [true, true+off],
    absent items' true counts are <= off, and the true top-1 survives."""
    from etl_sentinel_imagery_spark.operators.sketches import (
        topk_merge_agg,
        topk_sketch,
    )

    events = load_table(spark, SF_DIR, "events").withColumn(
        "day", F.to_date("ts")
    )
    k = 3
    daily = topk_sketch(events, ["day"], "user_id", k=k)
    merged = (
        daily.groupBy()
        .agg(topk_merge_agg("items", "off", k).alias("m"))
        .select(F.col("m.items").alias("items"), F.col("m.off").alias("off"))
        .collect()[0]
    )
    true_counts = {
        str(r["user_id"]): r["cnt"]
        for r in events.groupBy("user_id").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    items, off = dict(merged["items"]), merged["off"]
    assert 0 < len(items) <= k
    for item, est in items.items():
        assert true_counts[item] <= est <= true_counts[item] + off
    for item, cnt in true_counts.items():
        if item not in items:
            assert cnt <= off


# --- fixed-edge histogram ------------------------------------------------


def test_histogram_exact_counts_and_merge(spark):
    """Bin counts match exact predicates; per-day merge == whole build;
    quantile estimate lands within one bin of the exact quantile."""
    from etl_sentinel_imagery_spark.operators.sketches import (
        histogram_merge_agg,
        histogram_quantile_est,
        histogram_sketch,
    )

    orders = load_table(spark, SF_DIR, "orders").withColumn(
        "day", F.to_date("o_orderdate")
    )
    edges = [50_000.0, 150_000.0, 300_000.0]
    whole = histogram_sketch(orders, [], "o_totalprice", edges).collect()[0]["hist"]
    exact = [
        orders.filter(F.col("o_totalprice") < edges[0]).count(),
        orders.filter(
            (F.col("o_totalprice") >= edges[0]) & (F.col("o_totalprice") < edges[1])
        ).count(),
        orders.filter(
            (F.col("o_totalprice") >= edges[1]) & (F.col("o_totalprice") < edges[2])
        ).count(),
        orders.filter(F.col("o_totalprice") >= edges[2]).count(),
    ]
    assert list(whole) == exact
    daily = histogram_sketch(orders, ["day"], "o_totalprice", edges)
    merged = (
        daily.groupBy()
        .agg(histogram_merge_agg("hist", len(edges) + 1).alias("hist"))
        .collect()[0]["hist"]
    )
    assert list(merged) == exact
    est_median = (
        daily.groupBy()
        .agg(histogram_merge_agg("hist", len(edges) + 1).alias("hist"))
        .select(histogram_quantile_est("hist", edges, 0.5).alias("m"))
        .collect()[0]["m"]
    )
    true_median = orders.approxQuantile("o_totalprice", [0.5], 0.0)[0]
    lo = max([e for e in edges if e <= true_median], default=edges[0])
    hi = min([e for e in edges if e > true_median], default=edges[-1])
    assert lo <= est_median <= hi


# --- Count-Min sketch -----------------------------------------------------
def test_cm_exact_when_wide_and_one_sided(spark):
    """A sketch wider than the key space with no collisions is exact;
    estimates are NEVER below the true count (one-sided guarantee);
    absent keys estimate >= 0."""
    from collections import Counter

    from etl_sentinel_imagery_spark.operators.sketches import (
        cm_estimate,
        cm_sketch,
    )

    vals = [f"k{i % 17}" for i in range(500)]
    true = Counter(vals)
    df = spark.createDataFrame([(v,) for v in vals], "k string")
    sk = cm_sketch(df, [], "k", w=2048)
    probes = sorted(true) + ["absent_a", "absent_b"]
    est_cols = [
        cm_estimate(F.col("cm"), F.lit(p), 2048).alias(f"e{i}")
        for i, p in enumerate(probes)
    ]
    row = sk.select(*est_cols).collect()[0]
    for i, p in enumerate(probes):
        assert row[f"e{i}"] >= true.get(p, 0), p
        # at this width on 17 keys, collisions are absent -> exact
        assert row[f"e{i}"] == true.get(p, 0), p


def test_cm_merge_equals_union_and_weights(spark):
    """Merging per-part sketches equals sketching the union (exact,
    element-wise), and weighted counts flow through."""
    from etl_sentinel_imagery_spark.operators.sketches import (
        cm_estimate,
        cm_merge_agg,
        cm_sketch,
    )

    W = 256
    a = spark.createDataFrame(
        [("x", 2), ("y", 3), ("x", 5)], "k string, wgt int"
    )
    b = spark.createDataFrame([("x", 1), ("z", 7)], "k string, wgt int")
    both = a.unionByName(b)
    merged = (
        cm_sketch(a, [], "k", weight_col="wgt", w=W)
        .unionByName(cm_sketch(b, [], "k", weight_col="wgt", w=W))
        .agg(cm_merge_agg("cm", W).alias("cm"))
    )
    direct = cm_sketch(both, [], "k", weight_col="wgt", w=W)
    m = merged.collect()[0]["cm"]
    dr = direct.collect()[0]["cm"]
    assert [list(r) for r in m] == [list(r) for r in dr]
    est = merged.select(
        cm_estimate(F.col("cm"), F.lit("x"), W).alias("x"),
        cm_estimate(F.col("cm"), F.lit("z"), W).alias("z"),
    ).collect()[0]
    assert est["x"] == 8 and est["z"] == 7


def test_cm_error_bound_on_heavy_tail(spark):
    """Zipf-ish stream through a narrow sketch: every estimate is within
    the eps*N additive bound (eps = e/w) with comfortable margin, and
    the heavy hitter's estimate is tight relative to its mass."""
    import math

    from etl_sentinel_imagery_spark.operators.sketches import (
        cm_estimate,
        cm_sketch,
    )

    rows = []
    for i in range(2000):
        rows.append((f"k{i % (1 + i % 97)}",))  # skewed toward k0
    df = spark.createDataFrame(rows, "k string")
    W = 128
    n = len(rows)
    from collections import Counter

    true = Counter(r[0] for r in rows)
    sk = cm_sketch(df, [], "k", w=W)
    probes = ["k0", "k1", "k50"]
    row = sk.select(
        *[
            cm_estimate(F.col("cm"), F.lit(p), W).alias(p)
            for p in probes
        ]
    ).collect()[0]
    eps_n = math.e / W * n
    for p in probes:
        assert true[p] <= row[p] <= true[p] + eps_n, (p, row[p], true[p])


def test_cm_per_group_sketches(spark):
    from etl_sentinel_imagery_spark.operators.sketches import (
        cm_estimate,
        cm_sketch,
    )

    df = spark.createDataFrame(
        [("a", "x"), ("a", "x"), ("a", "y"), ("b", "x")],
        "g string, k string",
    )
    sk = cm_sketch(df, ["g"], "k", w=64)
    rows = {
        r["g"]: r
        for r in sk.select(
            "g", cm_estimate(F.col("cm"), F.lit("x"), 64).alias("x")
        ).collect()
    }
    assert rows["a"]["x"] == 2 and rows["b"]["x"] == 1


def test_cm_inner_product_estimates_join_size(spark):
    """The CM inner product upper-bounds the true equi-join output
    cardinality and lands within the (e/w)·Na·Nb slack."""
    import math

    from pyspark.sql import functions as F

    from etl_sentinel_imagery_spark.operators.sketches import (
        cm_inner_product,
        cm_sketch,
    )

    w = 1024
    # skewed key distributions: key k appears ~1000/k times in A,
    # uniform singletons in B plus hot key 1
    a = spark.range(0, 3000).select(
        (F.col("id") % 30 + 1).alias("k")
    )
    b = spark.range(0, 500).select(
        F.when(F.col("id") % 5 == 0, 1).otherwise(F.col("id")).alias("k")
    )
    true_size = a.join(b, "k").count()
    sa = cm_sketch(a, [], "k", w=w).select(F.col("cm").alias("cma"))
    sb = cm_sketch(b, [], "k", w=w).select(F.col("cm").alias("cmb"))
    est = (
        sa.crossJoin(sb)
        .select(
            cm_inner_product(F.col("cma"), F.col("cmb")).alias("est")
        )
        .collect()[0]["est"]
    )
    assert est >= true_size  # one-sided: never underestimates
    slack = math.e / w * a.count() * b.count()
    assert est <= true_size + slack
