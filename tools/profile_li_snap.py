"""Isolate the DV'd lineitem snapshot cost (round-13 write-path item).

Builds the battery's li table + composite MERGE once, then times the
snapshot aggregate and its plan pieces with the noop sink.

Usage: python tools/profile_li_snap.py [sf_dir]
"""

from __future__ import annotations

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
    spark = get_spark("profile-li", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    register_views(spark, sf_dir)

    from etl_sentinel_imagery_spark.operators.txlog import snapshot
    from etl_sentinel_imagery_spark.operators.txlog_sql import tx_sql
    from etl_sentinel_imagery_spark.queries.dml_q import (
        _LI_SRC_SQL,
        _MERGE_COMPOSITE,
    )

    dli = os.path.join(tempfile.mkdtemp(prefix="prof_li_"), "li")
    tables = {"li": dli}
    tx_sql(
        spark,
        "CREATE TABLE li AS SELECT l_orderkey, l_linenumber, "
        "CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS price "
        "FROM lineitem",
        tables,
    )
    spark.sql(_LI_SRC_SQL).createOrReplaceTempView("li_src")
    t0 = time.time()
    tx_sql(spark, _MERGE_COMPOSITE, tables)
    print(f"merge_composite: {time.time()-t0:.3f}s")

    def t(name, df):
        spark.sparkContext.setJobDescription(name)
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        print(f"  {name:28s} {time.time()-t0:8.3f}s")
        spark.sparkContext.setJobDescription(None)

    for rep in range(3):
        print(f"rep {rep}:")
        snap = snapshot(spark, dli)
        t("snapshot full", snap)
        t(
            "snapshot agg",
            snap.groupBy("l_linenumber").agg(
                F.count(F.lit(1)).alias("n"), F.sum("price").alias("s")
            ),
        )
        # pieces: raw files read (no DV), dv sidecar read
        import glob

        parts = glob.glob(os.path.join(dli, "**", "*.parquet"), recursive=True)
        data = [p for p in parts if "/_dv/" not in p and "/_stage" not in p]
        dvs = [p for p in parts if "/_dv/" in p]
        t("raw data files", spark.read.parquet(*data))
        if dvs:
            t("dv sidecar read", spark.read.parquet(*dvs))
        n_dv = (
            spark.read.parquet(*dvs).count() if dvs else 0
        )
        print(f"  data files={len(data)} dv files={len(dvs)} dv rows={n_dv}")


if __name__ == "__main__":
    main()
