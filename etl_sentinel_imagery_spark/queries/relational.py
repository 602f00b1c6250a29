"""Relational query battery — SURVEY.md §2.2-2.7 operator coverage.

Each query exercises one operator family the reference implements (or that
Spark provides as 'absent-in-reference' machinery, SURVEY.md §2.3-2.7),
expressed DataFrame-first so Catalyst handles pushdown / pruning / join
selection, with a DuckDB oracle stating the expected answer.

Determinism rules (see functions.exact): decimal/integer accumulation,
single final cast to double; every ORDER BY used under a LIMIT carries a
unique tiebreak key; timestamps compared in UTC.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_sentinel_imagery_spark.functions.exact import dec, dsum, money
from etl_sentinel_imagery_spark.plans.flagship import (
    FLAGSHIP_ORACLE_SQL,
    top_supplier_per_region,
)
from etl_sentinel_imagery_spark.queries.base import Q
from etl_sentinel_imagery_spark.sources.tables import load_table


# --- P4/P5/P6: equality + range + ≤ predicates, projection pruning -------
def _filter_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pushed-down predicate battery (imagery_store.py:216-221 analog)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_returnflag") == "R")
        & (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-07-01").cast("timestamp"))
        & (F.col("l_discount") <= F.lit(0.05))
    ).select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_shipdate"
    )


_FILTER_RANGE_SQL = """
SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_shipdate
FROM lineitem
WHERE l_returnflag = 'R'
  AND l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-07-01'
  AND l_discount <= 0.05
"""


# --- A1/A2: grouped aggregation (TPC-H Q1 shape) -------------------------
def _pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-sum battery (the reference's A1 groupby-sum, imagery_store.py:252)."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = money("l_extendedprice") * (
        F.lit(1).cast("decimal(4,2)") - dec("l_discount", 4, 2)
    )
    charge = (
        money("l_extendedprice")
        * (F.lit(1).cast("decimal(4,2)") - dec("l_discount", 4, 2))
        * (F.lit(1).cast("decimal(4,2)") + dec("l_tax", 4, 2))
    )
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2001-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("bigint")).alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .withColumn(
            "avg_price", F.col("sum_base_price") / F.col("count_order")
        )
    )


_PRICING_SUMMARY_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l_discount AS DECIMAL(4,2)))
                * (1 + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
       COUNT(*) AS count_order,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2001-09-02'
GROUP BY l_returnflag, l_linestatus
"""


# --- J3 + A1/A2: broadcast dim join + grouped + distinct aggregation -----
def _orders_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast hash join on small dims (J3, imagery_store.py:94 analog),
    plus exact distinct aggregation (A2 ext) in the same grouped pass —
    and, alongside the exact distinct, the per-nation HLL register
    statistics (operators.sketches): integer register sum / used-count of
    the customer sketch, cross-checked against DuckDB's independent SQL
    restatement of the same md5-60-bit register computation. The exact
    n_customers next to the sketch columns is the accuracy anchor."""
    from etl_sentinel_imagery_spark.operators.sketches import hll_sketch

    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    joined = orders.join(customer, orders.o_custkey == customer.c_custkey).join(
        F.broadcast(nation), customer.c_nationkey == nation.n_nationkey
    )
    base = joined.groupBy(F.col("n_name").alias("nation_name")).agg(
        F.count(F.lit(1)).alias("num_orders"),
        dsum("o_totalprice").alias("total_price"),
        F.countDistinct("o_custkey").alias("n_customers"),
        F.countDistinct("o_orderstatus").alias("n_statuses"),
    )
    sk = hll_sketch(
        joined.select(F.col("n_name").alias("nation_name"), "o_custkey"),
        ["nation_name"],
        "o_custkey",
    ).select(
        "nation_name",
        F.aggregate(
            "hll", F.lit(0).cast("long"), lambda a, x: a + x.cast("long")
        ).alias("hll_reg_sum"),
        F.size(F.filter("hll", lambda r: r > 0)).alias("hll_n_used"),
    )
    return base.join(sk, "nation_name")


def _hll_regs_sql(key_expr: str) -> str:
    """DuckDB restatement of operators.sketches register computation:
    60-bit md5 hash → 9-bit index + max-of-rho registers."""
    from etl_sentinel_imagery_spark.operators.sketches import (
        _SUB_BITS,
        HLL_M,
        HLL_P,
    )

    return f"""
    SELECT nation_name,
           hv & {HLL_M - 1} AS idx,
           CASE WHEN (hv >> {HLL_P}) = 0 THEN {_SUB_BITS + 1}
                ELSE {_SUB_BITS + 1} - length(bin(hv >> {HLL_P})) END AS rho
    FROM (
        SELECT nation_name,
               CAST(('0x' || substr(md5(CAST({key_expr} AS VARCHAR)), 1, 15))
                    AS BIGINT) AS hv
        FROM j
    )
    """


_ORDERS_PER_NATION_SQL = f"""
WITH j AS (
    SELECT n.n_name AS nation_name, o.o_custkey, o.o_totalprice, o.o_orderstatus
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
),
base AS (
    SELECT nation_name,
           COUNT(*) AS num_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
           COUNT(DISTINCT o_custkey) AS n_customers,
           COUNT(DISTINCT o_orderstatus) AS n_statuses
    FROM j
    GROUP BY 1
),
regs AS (
    SELECT nation_name, idx, MAX(rho) AS mx
    FROM ({_hll_regs_sql("o_custkey")})
    GROUP BY 1, 2
),
st AS (
    SELECT nation_name,
           CAST(SUM(mx) AS BIGINT) AS hll_reg_sum,
           COUNT(*) AS hll_n_used
    FROM regs
    GROUP BY 1
)
SELECT base.*, st.hll_reg_sum, st.hll_n_used
FROM base JOIN st USING (nation_name)
"""


# --- semi + anti joins in one battery (SURVEY §2.3) ----------------------
def _customer_order_presence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """left_semi ∪ left_anti over the same key — customers with open
    orders tagged 'open_orders', customers with no orders at all tagged
    'no_orders' (absent-in-reference join machinery, SURVEY §2.3)."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    open_orders = orders.filter(F.col("o_orderstatus") == "O")
    with_open = (
        customer.join(
            open_orders, customer.c_custkey == open_orders.o_custkey, "left_semi"
        )
        .select("c_custkey", "c_name")
        .withColumn("tag", F.lit("open_orders"))
    )
    without = (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .withColumn("tag", F.lit("no_orders"))
    )
    return with_open.unionByName(without)


_CUSTOMER_PRESENCE_SQL = """
SELECT c_custkey, c_name, 'open_orders' AS tag
FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
UNION ALL
SELECT c_custkey, c_name, 'no_orders' AS tag
FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
"""


# --- W1 idiom: top-1-per-group via window (imagery_store.py:252-259) -----
def _latest_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_orderdate"), F.desc("o_orderkey")
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("o_custkey").alias("custkey"),
            F.col("o_orderkey").alias("latest_orderkey"),
            F.col("o_orderdate").alias("latest_orderdate"),
            F.col("o_totalprice").alias("latest_totalprice"),
        )
    )


_LATEST_ORDER_SQL = """
SELECT o_custkey AS custkey,
       o_orderkey AS latest_orderkey,
       o_orderdate AS latest_orderdate,
       o_totalprice AS latest_totalprice
FROM (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
    FROM orders
)
WHERE rn = 1
"""


# --- window-frame battery: ROWS + RANGE frames, rank, first/last ---------
def _window_frames_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every frame-spec family of SURVEY §2.5 ext in one pass over orders:
    row_number / rank, a ROWS running sum, a RANGE trailing-90-day frame,
    and first/last value over the full partition. All windows share the
    o_custkey partitioning, so Catalyst evaluates them after ONE shuffle."""
    orders = load_table(spark, sf_dir, "orders")
    days = F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date"))
    with_days = orders.withColumn("order_day", days)
    order_w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    rank_w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    range_w = (
        Window.partitionBy("o_custkey")
        .orderBy("order_day")
        .rangeBetween(-90, Window.currentRow)
    )
    seq_w = Window.partitionBy("o_custkey").orderBy("order_day", "o_orderkey")
    full_w = seq_w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return with_days.select(
        "o_orderkey",
        "o_custkey",
        "order_day",
        F.row_number().over(order_w).alias("seq"),
        F.rank().over(rank_w).alias("price_rank"),
        F.sum(money("o_totalprice"))
        .over(order_w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("double")
        .alias("running_total"),
        F.sum(money("o_totalprice")).over(range_w).cast("double").alias(
            "spend_90d"
        ),
        F.count(F.lit(1)).over(range_w).alias("n_orders_90d"),
        F.first("o_orderkey").over(full_w).alias("first_orderkey"),
        F.last("o_orderkey").over(full_w).alias("last_orderkey"),
        F.ntile(4).over(rank_w).alias("price_quartile"),
        F.percent_rank().over(rank_w).alias("price_pct_rank"),
        F.cume_dist().over(rank_w).alias("price_cume_dist"),
    )


_WINDOW_FRAMES_SQL = """
SELECT o_orderkey, o_custkey, order_day,
       ROW_NUMBER() OVER seq_w AS seq,
       RANK() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS price_rank,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
            PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER rw AS DOUBLE) AS spend_90d,
       COUNT(*) OVER rw AS n_orders_90d,
       FIRST_VALUE(o_orderkey) OVER sw AS first_orderkey,
       LAST_VALUE(o_orderkey) OVER sw AS last_orderkey,
       CAST(NTILE(4) OVER pw AS INTEGER) AS price_quartile,
       PERCENT_RANK() OVER pw AS price_pct_rank,
       CUME_DIST() OVER pw AS price_cume_dist
FROM (
    SELECT *, CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))
                   AS INTEGER) AS order_day
    FROM orders
)
WINDOW seq_w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
       pw AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC),
       rw AS (PARTITION BY o_custkey ORDER BY order_day
              RANGE BETWEEN 90 PRECEDING AND CURRENT ROW),
       sw AS (PARTITION BY o_custkey ORDER BY order_day, o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
"""


# --- set operations (SURVEY §2.7, absent in reference) -------------------
def _nation_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    cust_nations = customer.select(F.col("c_nationkey").alias("nationkey")).distinct()
    supp_nations = supplier.select(F.col("s_nationkey").alias("nationkey")).distinct()
    both = cust_nations.intersect(supp_nations).withColumn("tag", F.lit("both"))
    cust_only = cust_nations.exceptAll(supp_nations).withColumn(
        "tag", F.lit("customer_only")
    )
    return both.unionByName(cust_only).select("tag", "nationkey")


_NATION_SET_OPS_SQL = """
SELECT 'both' AS tag, nationkey FROM (
    SELECT DISTINCT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT DISTINCT s_nationkey AS nationkey FROM supplier
)
UNION ALL
SELECT 'customer_only' AS tag, nationkey FROM (
    SELECT DISTINCT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT DISTINCT s_nationkey AS nationkey FROM supplier
)
"""


# --- rollup (grouping sets family, SURVEY §2.4 ext) ----------------------
def _rollup_region_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP ∪ CUBE ∪ explicit GROUPING SETS in one result, tagged by
    ``gset`` and disambiguated by grouping_id — the full grouping-sets
    family (the CUBE adds the nation-only slices ROLLUP lacks)."""
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    joined = customer.join(
        F.broadcast(nation), customer.c_nationkey == nation.n_nationkey
    ).join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    aggs = [
        F.count(F.lit(1)).alias("n_customers"),
        dsum("c_acctbal").alias("total_acctbal"),
    ]
    keys = [F.col("r_name").alias("region_name"), F.col("n_name").alias("nation_name")]
    rolled = (
        joined.rollup(*keys)
        .agg(F.grouping_id().alias("gid"), *aggs)
        .withColumn("gset", F.lit("rollup"))
    )
    cubed = (
        joined.cube(*keys)
        .agg(F.grouping_id().alias("gid"), *aggs)
        .withColumn("gset", F.lit("cube"))
    )
    return rolled.unionByName(cubed).select(
        "gset", "region_name", "nation_name", "gid", "n_customers", "total_acctbal"
    )


_ROLLUP_SQL = """
WITH joined AS (
    SELECT r.r_name AS region_name, n.n_name AS nation_name, c.c_acctbal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
)
SELECT 'rollup' AS gset, region_name, nation_name,
       CAST(GROUPING(region_name, nation_name) AS INTEGER) AS gid,
       COUNT(*) AS n_customers,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
FROM joined
GROUP BY ROLLUP (region_name, nation_name)
UNION ALL
SELECT 'cube' AS gset, region_name, nation_name,
       CAST(GROUPING(region_name, nation_name) AS INTEGER) AS gid,
       COUNT(*) AS n_customers,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
FROM joined
GROUP BY CUBE (region_name, nation_name)
"""


# --- pivot (conditional aggregation) -------------------------------------
def _pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(F.col("o_orderpriority").alias("priority"))
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .na.fill(0, ["F", "O", "P"])
        .select(
            "priority",
            F.col("F").alias("n_f"),
            F.col("O").alias("n_o"),
            F.col("P").alias("n_p"),
        )
    )


_PIVOT_SQL = """
SELECT o_orderpriority AS priority,
       COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
       COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
       COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS n_p
FROM orders
GROUP BY 1
"""


# --- case/when + having (derived columns P3 + post-agg filter) -----------
def _part_size_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    size_class = (
        F.when(F.col("p_size") < 10, "small")
        .when(F.col("p_size") < 30, "medium")
        .otherwise("large")
    )
    return (
        part.withColumn("size_class", size_class)
        .groupBy("p_brand", "size_class")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            dsum("p_retailprice").alias("total_price"),
        )
        .filter(F.col("n_parts") > 5)
    )


_PART_SIZE_CLASSES_SQL = """
SELECT p_brand, size_class, n_parts, total_price
FROM (
    SELECT p_brand,
           CASE WHEN p_size < 10 THEN 'small'
                WHEN p_size < 30 THEN 'medium'
                ELSE 'large' END AS size_class,
           COUNT(*) AS n_parts,
           CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
    FROM part
    GROUP BY 1, 2
)
WHERE n_parts > 5
"""


# --- TPC-H Q3 shape: 3-way join + agg + deterministic top-k --------------
def _shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1999-03-15").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1996-03-15").cast("timestamp")
    )
    revenue = money("l_extendedprice") * (
        F.lit(1).cast("decimal(4,2)") - dec("l_discount", 4, 2)
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(revenue).alias("rev_dec"))
        .select(
            "l_orderkey",
            F.col("rev_dec").cast("double").alias("revenue"),
            "o_orderdate",
            "o_orderpriority",
        )
        .orderBy(F.desc("rev_dec"), F.asc("l_orderkey"))
        .limit(20)
    )


_SHIPPING_PRIORITY_SQL = """
SELECT l_orderkey,
       CAST(rev_dec AS DOUBLE) AS revenue,
       o_orderdate, o_orderpriority
FROM (
    SELECT l.l_orderkey, o.o_orderdate, o.o_orderpriority,
           SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS rev_dec
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1999-03-15'
      AND l.l_shipdate  > TIMESTAMP '1996-03-15'
    GROUP BY 1, 2, 3
)
ORDER BY rev_dec DESC, l_orderkey ASC
LIMIT 20
"""


# --- TPC-H Q7 shape: multi-dim join + year extraction + grouped volume ---
def _nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape. The orders→customer hop runs through
    operators.skew.salted_join (big fact side salted into 8 shards,
    customer replicated per shard) — row-for-row identical to the plain
    equi-join the oracle states, so the skew-proof join is itself under
    the strict-hash gate, not just pytest equality."""
    from etl_sentinel_imagery_spark.operators.skew import salted_join

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supplier = load_table(spark, sf_dir, "supplier")
    customer = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_nationkey"
    )
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sk"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("ck"), F.col("n_name").alias("cust_nation")
    )
    volume = money("l_extendedprice") * (
        F.lit(1).cast("decimal(4,2)") - dec("l_discount", 4, 2)
    )
    return (
        salted_join(
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .join(supplier, li.l_suppkey == supplier.s_suppkey),
            customer,
            "o_custkey",
            n_salts=8,
        )
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("sk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("ck"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("ship_year"),
        )
        .agg(
            F.sum(volume).cast("double").alias("volume"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .filter(F.col("n_items") >= 5)
    )


_NATION_VOLUME_SQL = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l.l_shipdate) AS INTEGER) AS ship_year,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS volume,
       COUNT(*) AS n_items
FROM lineitem l
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
WHERE n1.n_name != n2.n_name
GROUP BY 1, 2, 3
HAVING COUNT(*) >= 5
"""


# (salted two-phase aggregation now rides inside _agg_battery2 — the
# skew-resistant operator itself lives in operators.skew)


# --- string-function battery 2: replace/translate/pad/trim ----------------
# --- full outer join + null handling -------------------------------------
def _customer_supplier_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of two grouped sides; coalesce null counts — the
    outer-join + null-function battery (absent-in-reference machinery)."""
    cust = (
        load_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("ck"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("sk"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    joined = cust.join(supp, cust.ck == supp.sk, "full_outer")
    return joined.select(
        F.coalesce(F.col("ck"), F.col("sk")).alias("nationkey"),
        F.coalesce(F.col("n_cust"), F.lit(0)).alias("n_customers"),
        F.coalesce(F.col("n_supp"), F.lit(0)).alias("n_suppliers"),
        F.nullif(F.col("n_supp"), F.lit(0)).alias("n_supp_or_null"),
        (
            F.coalesce(F.col("n_cust"), F.lit(0))
            - F.coalesce(F.col("n_supp"), F.lit(0))
        ).alias("imbalance"),
    )


_CUST_SUPP_BALANCE_SQL = """
SELECT coalesce(c.ck, s.sk) AS nationkey,
       coalesce(c.n_cust, 0) AS n_customers,
       coalesce(s.n_supp, 0) AS n_suppliers,
       nullif(s.n_supp, 0) AS n_supp_or_null,
       coalesce(c.n_cust, 0) - coalesce(s.n_supp, 0) AS imbalance
FROM (SELECT c_nationkey AS ck, COUNT(*) AS n_cust FROM customer GROUP BY 1) c
FULL OUTER JOIN
     (SELECT s_nationkey AS sk, COUNT(*) AS n_supp FROM supplier GROUP BY 1) s
  ON c.ck = s.sk
"""


# --- aggregation battery 2: bool/conditional aggs, sets, exact variance --
def _agg_battery2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """count_if / bool_and / bool_or / sorted collect_set, plus variance
    from EXACT integer moments (Σq, Σq² as BIGINT — quantity is integral
    and small, so the moment→double conversion is exact and the 4-op
    float formula is bit-identical across engines).

    NB: the decimal-moment variant on prices hash-MISMATCHED: DuckDB's
    decimal→double cast double-rounds (int128→double, then /10^scale)
    while Spark's BigDecimal cast rounds once — for >2^53-magnitude sums
    they differ in the last ulp. Integer moments sidestep the cast.

    The salted two-phase total (operators.skew.salted_sum_count — the
    skew-resistant form of the same per-flag sum) joins back on the flag,
    so its answer is hash-checked against the plain SQL SUM. Set-valued
    ``statuses`` is emitted as a joined string: array cells are not
    canonicalizable by the driver's value-hasher."""
    from etl_sentinel_imagery_spark.operators.skew import salted_sum_count

    li = load_table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity").cast("bigint")
    base = li.groupBy(F.col("l_returnflag").alias("flag")).agg(
        F.count(F.lit(1)).alias("n"),
        F.count_if(F.col("l_discount") > 0.05).alias("n_discounted"),
        F.bool_or(F.col("l_quantity") >= 50).alias("any_bulk"),
        F.bool_and(F.col("l_quantity") > 0).alias("all_positive"),
        F.concat_ws(",", F.array_sort(F.collect_set("l_linestatus"))).alias(
            "statuses"
        ),
        F.sum(q).alias("sum_q"),
        F.sum(q * q).alias("sum_q_sq"),
    )
    salted = salted_sum_count(
        li,
        ["l_returnflag"],
        money("l_extendedprice"),
        sum_alias="total_dec",
        count_alias="n_items_salted",
    ).select(
        F.col("l_returnflag").alias("flag"),
        F.col("total_dec").cast("double").alias("total_price"),
    )
    return base.join(F.broadcast(salted), "flag").select(
        "flag",
        "n",
        "n_discounted",
        "any_bulk",
        "all_positive",
        "statuses",
        (
            (
                F.col("sum_q_sq").cast("double")
                - F.col("sum_q").cast("double")
                * F.col("sum_q").cast("double")
                / F.col("n")
            )
            / (F.col("n") - 1)
        ).alias("variance_qty"),
        "total_price",
    )


_AGG_BATTERY2_SQL = """
SELECT flag, n, n_discounted, any_bulk, all_positive, statuses,
       (CAST(sum_q_sq AS DOUBLE)
        - CAST(sum_q AS DOUBLE) * CAST(sum_q AS DOUBLE) / n) / (n - 1)
           AS variance_qty,
       total_price
FROM (
    SELECT l_returnflag AS flag,
           COUNT(*) AS n,
           COUNT(*) FILTER (WHERE l_discount > 0.05) AS n_discounted,
           bool_or(l_quantity >= 50) AS any_bulk,
           bool_and(l_quantity > 0) AS all_positive,
           array_to_string(list_sort(list_distinct(list(l_linestatus))), ',')
               AS statuses,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_q,
           CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT))
                AS BIGINT) AS sum_q_sq,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
               AS total_price
    FROM lineitem
    GROUP BY 1
)
"""


# --- pivot→unpivot round-trip (stack) ------------------------------------
def _pivot_unpivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot to wide (conditional aggregation) then unpivot back to long
    via stack() — one query exercising both reshape directions; the long
    result equals a plain two-key groupBy, which is the oracle."""
    wide = _pivot_status_by_priority(spark, sf_dir)
    return wide.selectExpr(
        "priority",
        "stack(3, 'F', n_f, 'O', n_o, 'P', n_p) AS (status, n_orders)",
    ).filter(F.col("n_orders") > 0)


_PIVOT_UNPIVOT_SQL = """
SELECT o_orderpriority AS priority, o_orderstatus AS status,
       COUNT(*) AS n_orders
FROM orders
GROUP BY 1, 2
"""


# --- exact percentiles (probe-verified bit-equal to quantile_cont) --------
#: Fixed histogram edges for l_extendedprice (operators.sketches).
_HIST_EDGES = [20_000.0, 40_000.0, 70_000.0]


def _percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles PLUS the two exact-checkable sketch operators
    (operators.sketches): a fixed-edge histogram built at the finer
    (returnflag × linestatus) grain and MERGED up to returnflag — proving
    the rollup-merge path inside an oracle-checked query — and a top-3
    heavy-hitters sketch of l_linenumber whose stored counts and
    truncation offset are exact by construction."""
    from etl_sentinel_imagery_spark.operators.sketches import (
        histogram_merge_agg,
        histogram_sketch,
        topk_sketch,
    )

    li = load_table(spark, sf_dir, "lineitem")
    base = li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_extendedprice, 0.5)").alias("p50_price"),
        F.expr("percentile(l_extendedprice, 0.9)").alias("p90_price"),
        F.expr("percentile(l_quantity, 0.5)").alias("p50_qty"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
    )
    fine = histogram_sketch(
        li, ["l_returnflag", "l_linestatus"], "l_extendedprice", _HIST_EDGES
    )
    hist = (
        fine.groupBy("l_returnflag")
        .agg(histogram_merge_agg("hist", len(_HIST_EDGES) + 1).alias("hist"))
        .select(
            "l_returnflag",
            F.concat_ws(
                ",", F.transform("hist", lambda x: x.cast("string"))
            ).alias("price_hist"),
        )
    )
    tk = topk_sketch(li, ["l_returnflag"], "l_linenumber", k=3).select(
        "l_returnflag",
        F.array_join(
            F.transform(
                F.sort_array(F.map_entries("items")),
                lambda e: F.concat_ws(":", e["key"], e["value"].cast("string")),
            ),
            ",",
        ).alias("top3_linenumbers"),
        F.col("off").alias("top3_off"),
    )
    return base.join(hist, "l_returnflag").join(tk, "l_returnflag")


_PERCENTILES_SQL = f"""
WITH base AS (
    SELECT l_returnflag,
           quantile_cont(l_extendedprice, 0.5) AS p50_price,
           quantile_cont(l_extendedprice, 0.9) AS p90_price,
           quantile_cont(l_quantity, 0.5) AS p50_qty,
           MIN(l_extendedprice) AS min_price,
           MAX(l_extendedprice) AS max_price
    FROM lineitem
    GROUP BY 1
),
hist AS (
    SELECT l_returnflag,
           CAST(COUNT(*) FILTER (l_extendedprice < {_HIST_EDGES[0]}) AS VARCHAR)
           || ',' ||
           CAST(COUNT(*) FILTER (l_extendedprice >= {_HIST_EDGES[0]}
                AND l_extendedprice < {_HIST_EDGES[1]}) AS VARCHAR)
           || ',' ||
           CAST(COUNT(*) FILTER (l_extendedprice >= {_HIST_EDGES[1]}
                AND l_extendedprice < {_HIST_EDGES[2]}) AS VARCHAR)
           || ',' ||
           CAST(COUNT(*) FILTER (l_extendedprice >= {_HIST_EDGES[2]}) AS VARCHAR)
           AS price_hist
    FROM lineitem
    GROUP BY 1
),
cnts AS (
    SELECT l_returnflag, CAST(l_linenumber AS VARCHAR) AS item, COUNT(*) AS cnt
    FROM lineitem
    GROUP BY 1, 2
),
ranked AS (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY l_returnflag ORDER BY cnt DESC, item ASC) AS rn
    FROM cnts
),
tk AS (
    SELECT l_returnflag,
           string_agg(CASE WHEN rn <= 3 THEN item || ':' || CAST(cnt AS VARCHAR) END,
                      ',' ORDER BY item) AS top3_linenumbers,
           COALESCE(MAX(CASE WHEN rn = 4 THEN cnt END), 0) AS top3_off
    FROM ranked
    GROUP BY 1
)
SELECT base.*, hist.price_hist, tk.top3_linenumbers, tk.top3_off
FROM base
JOIN hist USING (l_returnflag)
JOIN tk USING (l_returnflag)
"""


QUERIES: dict[str, Q] = {
    "flagship_top_supplier_per_region": Q(
        top_supplier_per_region,
        FLAGSHIP_ORACLE_SQL,
        "filter→join→agg→window-top1-with-tiebreak (the reference's selection query shape)",
    ),
    "filter_range_pushdown": Q(_filter_range, _FILTER_RANGE_SQL, "P4/P5/P6 predicates"),
    "pricing_summary": Q(_pricing_summary, _PRICING_SUMMARY_SQL, "A1 grouped agg battery"),
    "orders_per_nation": Q(
        _orders_per_nation, _ORDERS_PER_NATION_SQL,
        "J3 broadcast join + grouped + distinct agg",
    ),
    "customer_order_presence": Q(
        _customer_order_presence, _CUSTOMER_PRESENCE_SQL, "semi + anti join battery"
    ),
    "latest_order_per_customer": Q(_latest_order_per_customer, _LATEST_ORDER_SQL, "W1 top-1-per-group"),
    "window_frames_battery": Q(
        _window_frames_battery, _WINDOW_FRAMES_SQL,
        "ROWS/RANGE frames, rank, running sums, first/last value",
    ),
    "nation_set_ops": Q(_nation_set_ops, _NATION_SET_OPS_SQL, "U: intersect/except/union"),
    "rollup_region_nation": Q(_rollup_region_nation, _ROLLUP_SQL, "rollup grouping sets"),
    "pivot_unpivot_status": Q(
        _pivot_unpivot_status, _PIVOT_UNPIVOT_SQL, "pivot→unpivot round-trip"
    ),
    "part_size_classes": Q(_part_size_classes, _PART_SIZE_CLASSES_SQL, "case/when + having"),
    "percentiles_by_flag": Q(
        _percentiles, _PERCENTILES_SQL,
        "exact percentiles + merged histogram sketch + top-k heavy-hitters sketch",
    ),
    "shipping_priority_top20": Q(
        _shipping_priority, _SHIPPING_PRIORITY_SQL,
        "TPC-H Q3 shape (sort-desc + deterministic top-k, TakeOrderedAndProject)",
    ),
    "customer_supplier_balance": Q(
        _customer_supplier_balance, _CUST_SUPP_BALANCE_SQL, "full outer join + null funcs"
    ),
    "nation_volume_by_year": Q(
        _nation_volume, _NATION_VOLUME_SQL,
        "TPC-H Q7 shape via skew-proof salted join",
    ),
    "agg_battery2": Q(
        _agg_battery2, _AGG_BATTERY2_SQL,
        "bool/conditional aggs + exact variance + salted two-phase total",
    ),
}
