"""Pin the README's 'table format in ten lines' example: the fenced
code block is extracted from README.md and EXECUTED verbatim (round-4
verdict #8) — if the API drifts, this test fails before a reader's
copy-paste does."""

from __future__ import annotations

import os
import re

from pyspark.sql import functions as F

README = os.path.join(os.path.dirname(__file__), "..", "README.md")


def _readme_block(title: str) -> str:
    text = open(README).read()
    section = text.split(title, 1)[1]
    m = re.search(r"```python\n(.*?)```", section, re.S)
    assert m, f"no python block under {title!r}"
    return m.group(1)


def test_table_format_example_runs_verbatim(spark, tmp_path):
    code = _readme_block("## The table format in ten lines")
    t = str(tmp_path / "readme_table")

    def seed(n, offset=0, extra=False):
        df = spark.range(offset, offset + n).select(
            F.col("id").alias("doc_id"),
            (F.col("id") % 3).cast("int").alias("day"),
            (F.col("id") * 2).alias("qty"),
        )
        if extra:
            df = df.withColumn("source", F.lit("crawl"))
        return df

    ns = {
        "spark": spark,
        "t": t,
        "df": seed(60),
        "more_df": seed(30, offset=500, extra=True),  # add-column
        "v0": 0,
        "v1": 1,
    }
    exec(compile(code, "README.md", "exec"), ns)  # noqa: S102

    # the example really did what it says
    tx = ns["tx"]
    snap = tx.snapshot(spark, t)
    assert snap.count() == 88  # 60 + 30 - 2 deleted
    assert snap.filter(F.col("doc_id").isin([7, 9])).count() == 0
    assert "source" in snap.columns  # evolution happened
    assert ns["old"].count() == 90  # pre-delete time travel
    df_pruned, stats = ns["df"], ns["stats"]
    assert stats["files_total"] >= stats["files_read"]
    assert set(ns["feed"].select("_change_type").distinct().toPandas()[
        "_change_type"
    ]) <= {"insert", "delete"}
    # the MV delta over the append commit is exactly the appended rows
    mv = {
        r["day"]: (r["n"], r["sum_qty"]) for r in ns["mv_delta"].collect()
    }
    want = {
        r["day"]: (r["n"], r["sum_qty"])
        for r in seed(30, offset=500)
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("qty").alias("sum_qty"))
        .collect()
    }
    assert mv == want
