from __future__ import annotations

import duckdb

from etl_sentinel_imagery_spark.operators.profiler import profile_table
from etl_sentinel_imagery_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_profile_exact_stats_match_duckdb(spark):
    """Every EXACT field (n, nulls, min/max, mean) must equal DuckDB's
    answer on the same parquet; sketch fields land within bounds."""
    df = load_table(spark, SF_DIR, "documents")
    prof = {r["column"]: r for r in profile_table(df).collect()}

    con = duckdb.connect()
    want = con.sql(
        f"""SELECT count(*) n,
               sum(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END) nn,
               min(n_chars), max(n_chars), avg(n_chars),
               count(DISTINCT n_chars),
               count(DISTINCT doc_id)
        FROM '{SF_DIR}/documents.parquet'"""
    ).fetchone()

    p = prof["n_chars"]
    assert p["n"] == want[0]
    assert p["n_null"] == (want[1] or 0)
    assert p["min"] == str(want[2]) and p["max"] == str(want[3])
    assert abs(p["mean"] - want[4]) < 1e-9
    # HLL++ at rsd=0.05: generous ±15% window
    assert abs(p["n_distinct_est"] - want[5]) <= max(3, 0.15 * want[5])
    assert abs(
        prof["doc_id"]["n_distinct_est"] - want[6]
    ) <= max(3, 0.15 * want[6])
    # quantiles ordered and inside the range
    assert want[2] <= p["p50"] <= p["p90"] <= p["p99"] <= want[3]
    # non-numeric column: numeric stats absent, min/max present
    t = prof["text"]
    assert t["mean"] is None and t["p50"] is None
    assert t["min"] is not None


def test_profile_topk_and_nulls(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b"), (4, None)], ["id", "cat"]
    )
    prof = {
        r["column"]: r for r in profile_table(df, topk=2).collect()
    }
    assert prof["cat"]["n_null"] == 1
    assert prof["cat"]["null_frac"] == 0.25
    top = [(t["value"], t["count"]) for t in prof["cat"]["top_values"]]
    assert top == [("a", 2), ("b", 1)]
    assert prof["id"]["top_values"][0]["count"] == 1


def test_profile_single_pass_plan(spark):
    """The stats aggregation must be ONE aggregate over ONE scan —
    no joins, no extra exchanges beyond the global agg pair."""
    df = load_table(spark, SF_DIR, "events")
    # reproduce the agg the profiler builds, then inspect its plan
    from etl_sentinel_imagery_spark.operators.profiler import (
        _is_numeric, _is_orderable,  # noqa: F401
    )
    from pyspark.sql import functions as F

    plan = df.agg(
        F.count(F.lit(1)),
        F.sum(F.col("value").isNull().cast("long")),
        F.approx_count_distinct("user_id"),
        F.percentile_approx(F.col("value"), [0.5], 1000),
    )._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert plan.count("Exchange") == 1  # partial → final, nothing else


def test_profile_drift_flags_the_right_columns(spark):
    from pyspark.sql import functions as F

    from etl_sentinel_imagery_spark.operators.profiler import (
        profile_drift,
        profile_table,
    )

    base = spark.range(0, 1000).select(
        F.col("id"),
        (F.col("id") % 100).cast("double").alias("x"),
        (F.col("id") % 5).cast("string").alias("cat"),
    )
    # drifted batch: x shifted by 10 sigmas, cat gains nulls + a column
    # disappears and another appears
    drifted = spark.range(0, 1000).select(
        F.col("id"),
        ((F.col("id") % 100) + 300).cast("double").alias("x"),
        F.when(F.col("id") % 2 == 0, (F.col("id") % 5).cast("string"))
        .alias("cat"),
        F.lit(1.0).alias("brand_new"),
    ).drop()
    po = profile_table(base)
    pn = profile_table(drifted)
    out = {r["column"]: r for r in profile_drift(po, pn).collect()}

    assert out["id"]["status"] == "ok"
    assert out["x"]["status"] == "drift"
    assert out["x"]["mean_shift_sigmas"] > 3
    assert out["x"]["range_widened"] is True
    assert out["cat"]["status"] == "drift"  # null_frac 0 → 0.5
    assert abs(out["cat"]["null_frac_delta"] - 0.5) < 0.01
    assert out["brand_new"]["status"] == "added"

    removed = profile_drift(pn, po).collect()
    assert {r["column"]: r["status"] for r in removed}["brand_new"] == "removed"


def test_profile_drift_dtype_change(spark):
    from pyspark.sql import functions as F

    from etl_sentinel_imagery_spark.operators.profiler import (
        profile_drift,
        profile_table,
    )

    a = spark.range(5).select(F.col("id").alias("v"))
    b = spark.range(5).select(F.col("id").cast("double").alias("v"))
    out = profile_drift(profile_table(a), profile_table(b)).collect()[0]
    assert out["dtype_changed"] and out["status"] == "drift"
