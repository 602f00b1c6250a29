"""Flagship query — the reference's selection pattern over the star schema.

The reference's one real "query" is: pushed-down filters → join candidates
to the AOI → per-candidate coverage aggregation → rank → top-1 with a date
tiebreak → narrow projection (`/root/reference/code/imagery_store.py:216-269`,
SURVEY.md §2.2-2.6, §7 step 1). This plan expresses that exact shape over
the driver tables: filter lineitem (predicate pushdown to parquet), join
facts to broadcast dims, exact-decimal revenue aggregation, window top-1
per region with a latest-date tiebreak, and a final narrow projection.

Scale notes: region/nation are fixed-cardinality → broadcast (no shuffle);
the lineitem⋈orders and lineitem⋈supplier joins shuffle on their keys and
AQE handles skew; the window partitions by region (5 keys) AFTER the
aggregation has already reduced cardinality to (region × supplier), so the
low-cardinality window never sees raw fact rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_sentinel_imagery_spark.functions.exact import dec, money
from etl_sentinel_imagery_spark.sources.tables import load_table


def top_supplier_per_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top revenue supplier per region, shipped 1996, discount ≤ 0.06.

    Mirrors `imagery_store.py:249-259`: group-sum a ratio per candidate,
    sort desc, tiebreak by latest date, keep the single winner — with
    region playing the AOI role and suppliers the candidate products.
    """
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")

    filtered = lineitem.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount") <= F.lit(0.06))
    )

    # Exact decimal revenue: order-independent accumulation (see functions.exact).
    revenue_expr = money("l_extendedprice") * (
        F.lit(1).cast("decimal(4,2)") - dec("l_discount", 4, 2)
    )

    joined = (
        filtered.join(orders, filtered.l_orderkey == orders.o_orderkey)
        .join(supplier, filtered.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )

    per_supplier = joined.groupBy(
        F.col("r_name").alias("region_name"),
        F.col("s_suppkey").alias("suppkey"),
        F.col("s_name").alias("supplier_name"),
    ).agg(
        F.sum(revenue_expr).alias("revenue_dec"),
        F.max("o_orderdate").alias("last_order_date"),
    )

    w = Window.partitionBy("region_name").orderBy(
        F.desc("revenue_dec"), F.desc("last_order_date"), F.asc("suppkey")
    )
    return (
        per_supplier.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "region_name",
            "suppkey",
            "supplier_name",
            F.col("revenue_dec").cast("double").alias("revenue"),
            "last_order_date",
        )
    )


FLAGSHIP_ORACLE_SQL = """
WITH rev AS (
    SELECT r.r_name AS region_name,
           s.s_suppkey AS suppkey,
           s.s_name AS supplier_name,
           SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS revenue_dec,
           MAX(o.o_orderdate) AS last_order_date
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate <  TIMESTAMP '1997-01-01'
      AND l.l_discount <= 0.06
    GROUP BY 1, 2, 3
)
SELECT region_name, suppkey, supplier_name,
       CAST(revenue_dec AS DOUBLE) AS revenue,
       last_order_date
FROM (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY region_name
        ORDER BY revenue_dec DESC, last_order_date DESC, suppkey ASC) AS rn
    FROM rev
)
WHERE rn = 1
"""
