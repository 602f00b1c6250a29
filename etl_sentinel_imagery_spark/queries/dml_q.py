"""The transaction-log DML surface under the hard oracle gate.

Round-7 verdict #3: everything rounds 6–7 built (SQL DML front door,
merge clause grammar, OPTIMIZE) was pytest-only — no CORRECTNESS row
exercised a post-DML table state. This battery creates a THROWAWAY
txlog table from `customer` via ``CREATE TABLE AS``, drives the
engine through `tx_sql` statements (a positional-binding INSERT
VALUES, UPDATE, DELETE, a MERGE exercising the round-8 grammar:
swapped ``t``/``s`` aliases, a column-list INSERT, WHEN NOT MATCHED
BY SOURCE clauses, plus content-neutral OPTIMIZE and OPTIMIZE ZORDER
passes), then SELECTs the post-state — and (round-9) aggregates the
``table_changes`` CHANGE FEED those statements emitted per
``_change_type`` (keys 900/901) and merges a COMPOSITE-KEY MERGE leg
over lineitem's (l_orderkey, l_linenumber) natural key (keys
100+linenumber); the DuckDB oracle derives the same post-states and
the same feed deltas relationally
(pure CTEs — DuckDB 1.0 has no MERGE statement, so the oracle states
the *semantics*, which is exactly what `base.Q` wants oracles to do).

Every number is integer cents (``CAST(ROUND(x * 100) AS BIGINT)``), so
the multi-statement arithmetic is exact on both engines — no float
accumulation order to disagree about.

Scale shape: the statements route onto the same transactional verbs
the Python API uses (merge-on-read DV deletes, probe-pruned matched
legs, one commit per statement); the throwaway table is sf-sized here
but the code path is the 100 TB one.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_sentinel_imagery_spark.queries.base import Q
from etl_sentinel_imagery_spark.sources.tables import register_views

# Statement battery (Spark side). The MERGE deliberately aliases the
# TARGET as `s` and the SOURCE as `t` — the round-7 wrong-answer corner
# (sequential alias rewriting re-captured pass-1 output) now sits under
# the driver's hash gate, not just pytest.
_UPDATE = "UPDATE cust SET bal = bal + 10000 WHERE c_nationkey < 5"
_DELETE = "DELETE FROM cust WHERE bal < 0"
_MERGE = """
MERGE INTO cust AS s USING dml_src AS t ON s.c_custkey = t.c_custkey
WHEN MATCHED AND t.cnt > 20 THEN UPDATE SET bal = s.bal + t.spent
WHEN MATCHED AND s.bal > t.spent THEN DELETE
WHEN MATCHED THEN UPDATE SET bal = t.spent - s.bal
WHEN NOT MATCHED AND t.cnt = 1
    THEN INSERT (c_custkey, bal) VALUES (t.c_custkey, t.spent)
WHEN NOT MATCHED BY SOURCE AND s.c_nationkey = 7 THEN DELETE
WHEN NOT MATCHED BY SOURCE THEN UPDATE SET bal = -s.bal
"""

# round-9: the composite-key leg — lineitem's natural key
# (l_orderkey, l_linenumber) merged via conjunctive equi-keys, the
# form the round-8 parser still rejected with surrogate-key guidance
_MERGE_COMPOSITE = """
MERGE INTO li AS a USING li_src AS b
ON a.l_orderkey = b.l_orderkey AND a.l_linenumber = b.l_linenumber
WHEN MATCHED AND a.price % 2 = 0 THEN UPDATE SET price = a.price + b.newprice
WHEN MATCHED THEN DELETE
WHEN NOT MATCHED THEN INSERT (l_orderkey, l_linenumber, price)
    VALUES (b.l_orderkey, b.l_linenumber, b.newprice)
"""

# composite merge source: a third of the real (orderkey, linenumber)
# tuples (leading-key DUPLICATES by construction — only the tuple is
# unique, which is the point) plus synthetic linenumber-99 rows that
# share real leading keys but can never tuple-match
_LI_SRC_SQL = """
SELECT l_orderkey, l_linenumber,
       CAST(SUM(CAST(ROUND(l_extendedprice * 50) AS BIGINT))
            AS BIGINT) AS newprice
FROM lineitem WHERE l_orderkey % 3 = 0
GROUP BY l_orderkey, l_linenumber
UNION ALL
SELECT DISTINCT l_orderkey, CAST(99 AS INT) AS l_linenumber,
       CAST(777 AS BIGINT) AS newprice
FROM lineitem WHERE l_orderkey % 7 = 0
"""

# the merge source: per-customer order stats (matched rows) plus a
# synthetic key range far above any real custkey (NOT MATCHED inserts)
_SRC_SQL = """
SELECT o_custkey AS c_custkey,
       COUNT(*) AS cnt,
       SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS spent
FROM orders
GROUP BY o_custkey
UNION ALL
SELECT DISTINCT o_custkey + 1000000 AS c_custkey,
       CAST(1 AS BIGINT) AS cnt,
       CAST(5000 AS BIGINT) AS spent
FROM orders
WHERE o_custkey % 97 = 0
"""


def _txlog_dml_battery(
    spark: SparkSession,
    sf_dir: str,
    leg_timings: dict | None = None,
) -> DataFrame:
    """``leg_timings``: pass a dict and each statement GROUP records
    its wall seconds into it (round-10 verdict #1 — the write bench
    row grew round over round and every explanation was by
    construction; per-leg numbers make drift attribution one read).
    The final SELECT aggregates are lazy and excluded — bench reports
    them as the residual against the battery total."""
    import time as _time

    from etl_sentinel_imagery_spark.operators.txlog import (
        snapshot,
        table_changes,
    )
    from etl_sentinel_imagery_spark.operators.txlog_sql import tx_sql

    class _leg:
        def __init__(self, name: str):
            self.name = name

        def __enter__(self):
            self.t0 = _time.time()

        def __exit__(self, *exc):
            if leg_timings is not None and exc[0] is None:
                leg_timings[self.name] = round(
                    leg_timings.get(self.name, 0.0)
                    + _time.time()
                    - self.t0,
                    3,
                )
            return False

    register_views(spark, sf_dir)
    d = os.path.join(tempfile.mkdtemp(prefix="txdml_"), "cust")
    tables = {"cust": d}
    # CTAS opens the battery, so table creation itself sits under the
    # gate; the synthetic VALUES row exercises the round-8 positional
    # binding (arity matches → binds c_custkey/c_nationkey/bal, with
    # int→bigint widening on append)
    with _leg("ctas_cust"):
        tx_sql(
            spark,
            "CREATE TABLE cust AS SELECT c_custkey, c_nationkey, "
            "CAST(ROUND(c_acctbal * 100) AS BIGINT) AS bal FROM customer",
            tables,
        )
    with _leg("insert_values"):
        tx_sql(
            spark,
            "INSERT INTO cust VALUES (9000001, CAST(5 AS INT), 123456)",
            tables,
        )
    # round-10: column DEFAULTs under the gate — declared as metadata,
    # applied by an INSERT that OMITS the column; the defaulted row
    # then rides every later statement (the by-source MERGE leg
    # negates it), so the hash proves the fill value end to end
    with _leg("default_insert"):
        tx_sql(
            spark,
            "ALTER TABLE cust ALTER COLUMN bal SET DEFAULT 31337",
            tables,
        )
        tx_sql(
            spark,
            "INSERT INTO cust (c_custkey, c_nationkey) "
            "VALUES (9000002, CAST(6 AS INT))",
            tables,
        )
    with _leg("update"):
        tx_sql(spark, _UPDATE, tables)
    with _leg("delete"):
        tx_sql(spark, _DELETE, tables)
    with _leg("merge"):
        spark.sql(_SRC_SQL).createOrReplaceTempView("dml_src")
        tx_sql(spark, _MERGE, tables)
    # both maintenance forms are content-neutral by contract — the
    # hash gate is what proves it on this battery's post-state
    with _leg("optimize"):
        tx_sql(spark, "OPTIMIZE cust", tables)
    with _leg("zorder"):
        tx_sql(spark, "OPTIMIZE cust ZORDER BY (c_custkey)", tables)
    cust_agg = (
        snapshot(spark, d)
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("bal").cast("long").alias("total_bal"),
            F.min("bal").alias("min_bal"),
            F.max("bal").alias("max_bal"),
        )
    )
    # round-9 verdict #3: the CHANGE FEED itself under the hash gate —
    # table_changes(v0→head) is what every derived table (including
    # the ANN index sync) consumes, and until now only the post-STATE
    # was oracle-checked. Aggregate the feed per _change_type (keys
    # 900=insert / 901=delete, disjoint from every other leg); the
    # oracle derives identical deltas from its relational replay's
    # intermediate states, including the exceptAll netting (a row
    # updated to an identical image cancels out of both sides).
    # OPTIMIZE/ZORDER are content-neutral and must contribute nothing.
    feed = table_changes(spark, d, 0)
    feed_agg = feed.groupBy(
        F.when(F.col("_change_type") == "insert", F.lit(900))
        .otherwise(F.lit(901))
        .cast("int")
        .alias("c_nationkey")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("bal").cast("long").alias("total_bal"),
        F.min("bal").alias("min_bal"),
        F.max("bal").alias("max_bal"),
    )
    # composite-key leg: lineitem's (l_orderkey, l_linenumber) natural
    # key through the conjunctive-equi-key MERGE (round-9); its
    # post-state folds into the same output shape keyed 100 +
    # linenumber (disjoint from the 0..24 nation keys)
    dli = os.path.join(tempfile.mkdtemp(prefix="txdml_"), "li")
    tables["li"] = dli
    with _leg("ctas_li"):
        tx_sql(
            spark,
            "CREATE TABLE li AS SELECT l_orderkey, l_linenumber, "
            "CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS price "
            "FROM lineitem",
            tables,
        )
    with _leg("merge_composite"):
        spark.sql(_LI_SRC_SQL).createOrReplaceTempView("li_src")
        tx_sql(spark, _MERGE_COMPOSITE, tables)
    li_agg = (
        snapshot(spark, dli)
        .groupBy(
            (F.col("l_linenumber") + F.lit(100))
            .cast("int")
            .alias("c_nationkey")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("price").cast("long").alias("total_bal"),
            F.min("price").alias("min_bal"),
            F.max("price").alias("max_bal"),
        )
    )
    # round-10: CONVERT TO TXLOG + REORG APPLY (PURGE) under the
    # gate — nation written as a PLAIN hive-partitioned parquet dir
    # (duplicate basenames across leaves by construction: one write
    # job's tasks reuse their part-N name in every leaf), adopted in
    # place with zero data IO, DV-deleted through SQL, then purged;
    # REORG is content-neutral by contract, so one aggregate proves
    # the adoption, the exact full-name DV keying, AND the rewrite.
    dn = os.path.join(tempfile.mkdtemp(prefix="txdml_"), "nat")
    with _leg("convert_reorg"):
        spark.sql(
            "SELECT n_nationkey, n_name, n_regionkey FROM nation"
        ).repartition(2).write.partitionBy("n_regionkey").parquet(dn)
        tables["nat"] = dn
        tx_sql(
            spark,
            f"CONVERT TO TXLOG `{dn}` PARTITIONED BY (n_regionkey)",
            tables,
        )
        tx_sql(spark, "DELETE FROM nat WHERE n_nationkey % 3 = 0", tables)
        tx_sql(spark, "REORG TABLE nat APPLY (PURGE)", tables)
    nat_agg = (
        snapshot(spark, dn)
        .groupBy(
            (F.col("n_regionkey") + F.lit(200))
            .cast("int")
            .alias("c_nationkey")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("n_nationkey").cast("long").alias("total_bal"),
            F.min("n_nationkey").cast("long").alias("min_bal"),
            F.max("n_nationkey").cast("long").alias("max_bal"),
        )
    )
    # round-10 third wave: COPY INTO under the gate — idempotent file
    # ingestion. The landing dir holds region split across two parquet
    # files (pyarrow, fully deterministic values rk*7+3); COPY runs
    # TWICE (the second MUST be a ledger no-op — any re-load doubles n
    # per key and breaks the hash), then a late-arriving file lands
    # and a final COPY loads ONLY it (keys 310+ prove it loaded, n=1
    # everywhere proves nothing else re-loaded).
    import pyarrow as pa
    import pyarrow.parquet as pq

    cp_root = tempfile.mkdtemp(prefix="txdml_")
    srcd = os.path.join(cp_root, "landing")
    os.makedirs(srcd)
    keys = sorted(
        int(r[0])
        for r in spark.sql("SELECT r_regionkey FROM region").collect()
    )

    def _land(name, ks):
        pq.write_table(
            pa.table(
                {
                    "rk": pa.array(ks, pa.int64()),
                    "val": pa.array([k * 7 + 3 for k in ks], pa.int64()),
                }
            ),
            os.path.join(srcd, name),
        )

    _land("a.parquet", keys[: len(keys) // 2])
    _land("b.parquet", keys[len(keys) // 2:])
    dcp = os.path.join(cp_root, "cp")
    tables["cp"] = dcp
    with _leg("copy_into"):
        tx_sql(spark, "CREATE TABLE cp (rk long, val long)", tables)
        tx_sql(
            spark, f"COPY INTO cp FROM '{srcd}' FILEFORMAT = PARQUET",
            tables,
        )
        tx_sql(spark, f"COPY INTO cp FROM '{srcd}'", tables)  # no-op
        _land("late.parquet", [k + 10 for k in keys])
        tx_sql(spark, f"COPY INTO cp FROM '{srcd}'", tables)
    cp_agg = (
        snapshot(spark, dcp)
        .groupBy((F.col("rk") + F.lit(300)).cast("int").alias("c_nationkey"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("val").cast("long").alias("total_bal"),
            F.min("val").alias("min_bal"),
            F.max("val").alias("max_bal"),
        )
    )
    return (
        cust_agg.unionByName(feed_agg)
        .unionByName(li_agg)
        .unionByName(nat_agg)
        .unionByName(cp_agg)
    )


# The oracle replays the same statement sequence as relational algebra:
# UPDATE = CASE projection; DELETE = filter; MERGE = first-match-wins
# CASE routing over the matched join, anti-join inserts, and the
# by-source anti-join leg (delete encoded as NULL then filtered —
# bal is non-null in every surviving leg by construction).
_ORACLE = """
WITH base AS (
    SELECT c_custkey, c_nationkey,
           CAST(ROUND(c_acctbal * 100) AS BIGINT) AS bal
    FROM customer
    UNION ALL
    -- the battery's positional-VALUES insert (key far above any real
    -- custkey and any synthetic merge-source key)
    SELECT CAST(9000001 AS BIGINT), CAST(5 AS INTEGER),
           CAST(123456 AS BIGINT)
    UNION ALL
    -- the column-DEFAULT insert: bal omitted, filled with 31337
    SELECT CAST(9000002 AS BIGINT), CAST(6 AS INTEGER),
           CAST(31337 AS BIGINT)
),
u1 AS (
    SELECT c_custkey, c_nationkey,
           CASE WHEN c_nationkey < 5 THEN bal + 10000 ELSE bal END AS bal
    FROM base
),
d1 AS (
    SELECT * FROM u1 WHERE bal >= 0
),
src AS (
    -- CAST the sum: DuckDB's SUM(BIGINT) is HUGEINT, which would
    -- propagate through bal into float64 min/max under pandas —
    -- a dtype mismatch against Spark's int64 under the driver's
    -- dtype-sensitive hash
    SELECT o_custkey AS c_custkey,
           COUNT(*) AS cnt,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                AS BIGINT) AS spent
    FROM orders
    GROUP BY o_custkey
    UNION ALL
    SELECT DISTINCT o_custkey + 1000000 AS c_custkey,
           CAST(1 AS BIGINT) AS cnt,
           CAST(5000 AS BIGINT) AS spent
    FROM orders
    WHERE o_custkey % 97 = 0
),
matched AS (
    SELECT t.c_custkey, t.c_nationkey,
           CASE WHEN s.cnt > 20 THEN t.bal + s.spent
                WHEN t.bal > s.spent THEN NULL
                ELSE s.spent - t.bal END AS bal
    FROM d1 t JOIN src s ON t.c_custkey = s.c_custkey
),
inserts AS (
    SELECT s.c_custkey, CAST(NULL AS INTEGER) AS c_nationkey,
           s.spent AS bal
    FROM src s LEFT JOIN d1 t ON t.c_custkey = s.c_custkey
    WHERE t.c_custkey IS NULL AND s.cnt = 1
),
by_source AS (
    SELECT t.c_custkey, t.c_nationkey,
           CASE WHEN t.c_nationkey = 7 THEN NULL ELSE -t.bal END AS bal
    FROM d1 t LEFT JOIN src s ON t.c_custkey = s.c_custkey
    WHERE s.c_custkey IS NULL
),
final AS (
    SELECT * FROM matched WHERE bal IS NOT NULL
    UNION ALL
    SELECT * FROM inserts
    UNION ALL
    SELECT * FROM by_source WHERE bal IS NOT NULL
),
-- the CHANGE FEED's per-commit deltas, derived from the replay's own
-- intermediate states (round-9 verdict #3): v1 append, v2 UPDATE
-- pairs, v3 DELETE, v4 MERGE as the keyed set-difference of post vs
-- pre — identical images cancel on BOTH sides, exactly the feed's
-- exceptAll netting (c_custkey is unique in every state, so set
-- difference equals multiset difference); OPTIMIZE/ZORDER are
-- content-neutral and contribute nothing
feed AS (
    SELECT 'insert' AS ct, CAST(123456 AS BIGINT) AS bal
    UNION ALL
    SELECT 'insert', CAST(31337 AS BIGINT)
    UNION ALL
    SELECT 'delete', bal FROM base WHERE c_nationkey < 5
    UNION ALL
    SELECT 'insert', bal + 10000 FROM base WHERE c_nationkey < 5
    UNION ALL
    SELECT 'delete', bal FROM u1 WHERE bal < 0
    UNION ALL
    SELECT 'delete', p.bal
    FROM d1 p LEFT JOIN final q
      ON p.c_custkey = q.c_custkey
     AND COALESCE(p.c_nationkey, -1) = COALESCE(q.c_nationkey, -1)
     AND p.bal = q.bal
    WHERE q.c_custkey IS NULL
    UNION ALL
    SELECT 'insert', q.bal
    FROM final q LEFT JOIN d1 p
      ON p.c_custkey = q.c_custkey
     AND COALESCE(p.c_nationkey, -1) = COALESCE(q.c_nationkey, -1)
     AND p.bal = q.bal
    WHERE p.c_custkey IS NULL
),
-- composite-key leg: the conjunctive-equi-key MERGE over lineitem's
-- (l_orderkey, l_linenumber) natural key, replayed relationally with
-- BOTH keys in every join
li_base AS (
    SELECT l_orderkey, l_linenumber,
           CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS price
    FROM lineitem
),
li_src AS (
    -- GROUP BY makes the source tuple-unique (the driver's synthetic
    -- lineitem does NOT honor the TPC-H PK)
    SELECT l_orderkey, l_linenumber,
           CAST(SUM(CAST(ROUND(l_extendedprice * 50) AS BIGINT))
                AS BIGINT) AS newprice
    FROM lineitem WHERE l_orderkey % 3 = 0
    GROUP BY l_orderkey, l_linenumber
    UNION ALL
    SELECT DISTINCT l_orderkey, CAST(99 AS INTEGER) AS l_linenumber,
           CAST(777 AS BIGINT) AS newprice
    FROM lineitem WHERE l_orderkey % 7 = 0
),
li_matched AS (
    -- first-match-wins: even price updates, odd price deletes (NULL)
    SELECT a.l_orderkey, a.l_linenumber,
           CASE WHEN a.price % 2 = 0 THEN a.price + b.newprice
                ELSE NULL END AS price
    FROM li_base a JOIN li_src b
      ON a.l_orderkey = b.l_orderkey
     AND a.l_linenumber = b.l_linenumber
),
li_untouched AS (
    SELECT a.l_orderkey, a.l_linenumber, a.price
    FROM li_base a LEFT JOIN li_src b
      ON a.l_orderkey = b.l_orderkey
     AND a.l_linenumber = b.l_linenumber
    WHERE b.l_orderkey IS NULL
),
li_inserts AS (
    SELECT b.l_orderkey, b.l_linenumber, b.newprice AS price
    FROM li_src b LEFT JOIN li_base a
      ON a.l_orderkey = b.l_orderkey
     AND a.l_linenumber = b.l_linenumber
    WHERE a.l_orderkey IS NULL
),
li_final AS (
    SELECT * FROM li_matched WHERE price IS NOT NULL
    UNION ALL SELECT * FROM li_untouched
    UNION ALL SELECT * FROM li_inserts
)
SELECT c_nationkey,
       COUNT(*) AS n,
       CAST(SUM(bal) AS BIGINT) AS total_bal,
       CAST(MIN(bal) AS BIGINT) AS min_bal,
       CAST(MAX(bal) AS BIGINT) AS max_bal
FROM final
GROUP BY c_nationkey
UNION ALL
SELECT CAST(CASE WHEN ct = 'insert' THEN 900 ELSE 901 END
            AS INTEGER) AS c_nationkey,
       COUNT(*) AS n,
       CAST(SUM(bal) AS BIGINT) AS total_bal,
       CAST(MIN(bal) AS BIGINT) AS min_bal,
       CAST(MAX(bal) AS BIGINT) AS max_bal
FROM feed
GROUP BY ct
UNION ALL
SELECT CAST(l_linenumber + 100 AS INTEGER) AS c_nationkey,
       COUNT(*) AS n,
       CAST(SUM(price) AS BIGINT) AS total_bal,
       CAST(MIN(price) AS BIGINT) AS min_bal,
       CAST(MAX(price) AS BIGINT) AS max_bal
FROM li_final
GROUP BY l_linenumber
UNION ALL
-- round-10 CONVERT/REORG leg: adoption + DV delete + purge replay
-- to a plain filter (the purge is content-neutral by contract, so
-- the oracle needs only the post-DELETE state)
SELECT CAST(n_regionkey + 200 AS INTEGER) AS c_nationkey,
       COUNT(*) AS n,
       CAST(SUM(n_nationkey) AS BIGINT) AS total_bal,
       CAST(MIN(n_nationkey) AS BIGINT) AS min_bal,
       CAST(MAX(n_nationkey) AS BIGINT) AS max_bal
FROM nation WHERE n_nationkey % 3 <> 0
GROUP BY n_regionkey
UNION ALL
-- round-10 COPY INTO leg: two loads of the landing dir plus a late
-- file; the ledger makes the second load a no-op, so every key
-- appears exactly ONCE (n=1 is the idempotence proof) — original
-- keys at +300, the late file's shifted keys at +310
SELECT CAST(rk + 300 AS INTEGER) AS c_nationkey,
       COUNT(*) AS n,
       CAST(SUM(rk * 7 + 3) AS BIGINT) AS total_bal,
       CAST(MIN(rk * 7 + 3) AS BIGINT) AS min_bal,
       CAST(MAX(rk * 7 + 3) AS BIGINT) AS max_bal
FROM (SELECT r_regionkey AS rk FROM region
      UNION ALL
      SELECT r_regionkey + 10 FROM region) copied
GROUP BY rk
"""


QUERIES: dict[str, Q] = {
    "txlog_dml_battery": Q(
        _txlog_dml_battery,
        _ORACLE,
        "tx_sql UPDATE/DELETE/MERGE (swapped aliases, column-list "
        "INSERT, NOT MATCHED BY SOURCE, composite ON keys over "
        "lineitem's natural key) + OPTIMIZE; post-state AND the "
        "table_changes feed (per-_change_type deltas incl. exceptAll "
        "netting) vs a relational replay; round-10: CONVERT TO TXLOG "
        "of a hive parquet dir + DV DELETE + REORG APPLY (PURGE), and "
        "COPY INTO idempotent ingestion (double-load no-op + "
        "late-file pickup, ledger-atomic)",
    ),
}
