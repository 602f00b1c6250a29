"""Drill into the DV'd snapshot plan: which operator eats the time.

Usage: python tools/profile_li_snap2.py [sf_dir]
"""

from __future__ import annotations

import glob
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from etl_sentinel_imagery_spark.session import get_spark
from etl_sentinel_imagery_spark.sources.tables import register_views


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("profile-li2", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    register_views(spark, sf_dir)

    from etl_sentinel_imagery_spark.operators.txlog import (
        _plain_path_col,
        snapshot,
    )
    from etl_sentinel_imagery_spark.operators.txlog_sql import tx_sql
    from etl_sentinel_imagery_spark.queries.dml_q import (
        _LI_SRC_SQL,
        _MERGE_COMPOSITE,
    )

    dli = os.path.join(tempfile.mkdtemp(prefix="prof_li2_"), "li")
    tables = {"li": dli}
    tx_sql(
        spark,
        "CREATE TABLE li AS SELECT l_orderkey, l_linenumber, "
        "CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS price "
        "FROM lineitem",
        tables,
    )
    spark.sql(_LI_SRC_SQL).createOrReplaceTempView("li_src")
    tx_sql(spark, _MERGE_COMPOSITE, tables)

    def t(name, df):
        spark.sparkContext.setJobDescription(name)
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        print(f"  {name:36s} {time.time()-t0:8.3f}s")
        spark.sparkContext.setJobDescription(None)

    parts = glob.glob(os.path.join(dli, "**", "*.parquet"), recursive=True)
    data = [p for p in parts if "/_dv/" not in p and "/_stage" not in p]
    dvs = [p for p in parts if "/_dv/" in p]

    raw = spark.read.parquet(*data)
    dv = spark.read.parquet(*dvs).select(
        F.col("file_name").alias("_file_name"),
        F.col("pos").alias("_row_pos"),
    )
    for rep in range(2):
        print(f"rep {rep}:")
        # piece 1: raw + metadata path derivation only
        t(
            "raw + _plain_path_col",
            raw.select(
                "*",
                _plain_path_col().alias("_abs_path"),
                F.col("_metadata.row_index").alias("_row_pos"),
            ),
        )
        # piece 2: raw + raw file_path (no regex/url_decode)
        t(
            "raw + raw file_path",
            raw.select(
                "*",
                F.col("_metadata.file_path").alias("_abs_path"),
                F.col("_metadata.row_index").alias("_row_pos"),
            ),
        )
        # piece 3: full anti-join with file_name string key
        keyed = raw.select(
            "*",
            _plain_path_col().alias("_file_name"),
            F.col("_metadata.row_index").alias("_row_pos"),
        )
        dv2 = dv.withColumn(
            "_file_name",
            F.concat(F.lit(dli + "/"), F.col("_file_name")),
        )
        t(
            "antijoin bcast (string,long) key",
            keyed.join(F.broadcast(dv2), ["_file_name", "_row_pos"], "left_anti"),
        )
        t("full snapshot", snapshot(spark, dli))

    print(snapshot(spark, dli)._jdf.queryExecution().executedPlan().toString()[:6000])


if __name__ == "__main__":
    main()
