"""Bucketed co-located join: the no-shuffle fact-fact join (PERF.md).

At 100 TB the lineitem⋈orders shuffle is the dominant cost; bucketing
both tables by the join key at write time makes the join shuffle-free.
This test proves the engine's bucketed layout actually removes the
Exchange from the physical plan.
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

from etl_sentinel_imagery_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    # warehouse dir is a static conf — tables land in ./spark-warehouse
    # (gitignored); DROP TABLE cleans them up.
    load_table(spark, SF_DIR, "lineitem").write.bucketBy(8, "l_orderkey").sortBy(
        "l_orderkey"
    ).mode("overwrite").saveAsTable("li_bucketed")
    load_table(spark, SF_DIR, "orders").write.bucketBy(8, "o_orderkey").sortBy(
        "o_orderkey"
    ).mode("overwrite").saveAsTable("ord_bucketed")
    yield "li_bucketed", "ord_bucketed"
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS ord_bucketed")


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    li, ord_ = bucketed_tables
    # test tables are tiny → Spark would broadcast; force the sort-merge
    # path to observe the bucket co-location (restore conf after)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = (
            spark.table(li)
            .join(spark.table(ord_), F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        text = _plan(joined)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    join_section = text.split("HashAggregate")[0]
    # co-located buckets: the join reads both sides without an Exchange
    assert "SortMergeJoin" in text or "ShuffledHashJoin" in text
    assert "Exchange" not in join_section, f"unexpected shuffle:\n{join_section}"
    # and the answer matches the unbucketed join
    plain = (
        load_table(spark, SF_DIR, "lineitem")
        .join(
            load_table(spark, SF_DIR, "orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert sorted(map(tuple, joined.collect())) == sorted(map(tuple, plain.collect()))
