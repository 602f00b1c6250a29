"""Scalar-function battery — SURVEY.md §2.8 (F1-F17) coverage.

The reference's scalar layer is string splitting / substring date assembly
/ prefix stripping / casts / templating (`imagery_store.py:119-132`,
`85-87`). These queries exercise each family over the driver tables with
exact cross-engine semantics (note: double→int casts TRUNCATE in Spark but
ROUND in DuckDB, so every such cast goes through an explicit ``floor``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_sentinel_imagery_spark.queries.base import Q
from etl_sentinel_imagery_spark.sources.tables import load_table


def _string_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1 split+index, F3 prefix strip, F9 templating, regex, array ops."""
    part = load_table(spark, sf_dir, "part")
    toks = F.split(F.col("p_name"), " ")
    return part.select(
        "p_partkey",
        toks.getItem(0).alias("first_word"),
        F.size(toks).alias("n_words"),
        F.element_at(F.array_sort(toks), 1).alias("first_sorted_word"),
        F.regexp_extract(F.col("p_brand"), "([0-9]+)", 1)
        .cast("int")
        .alias("brand_num"),
        F.upper(F.col("p_type")).alias("type_upper"),
        F.concat_ws("|", F.col("p_brand"), F.col("p_type")).alias("brand_type"),
        F.length(F.col("p_name")).alias("name_len"),
        F.substring(F.col("p_name"), 1, 4).alias("name_prefix"),
        (F.col("p_partkey") % 7).alias("key_mod7"),
        F.floor(F.col("p_retailprice")).cast("bigint").alias("price_floor"),
        # replace/translate/pad/trim/case tier (formerly
        # scalar_string_battery2 over customer — consolidated here to
        # free a registry slot for ann_deterministic_battery)
        F.regexp_replace(F.col("p_name"), "o+", "o").alias("name_squeezed"),
        F.translate(F.col("p_type"), "AEIOU", "aeiou").alias(
            "type_lower_vowels"
        ),
        F.lpad(F.col("p_partkey").cast("string"), 8, "0").alias("key_padded"),
        F.rpad(F.col("p_brand"), 12, ".").alias("brand_padded"),
        F.trim(F.concat(F.lit("  "), F.col("p_brand"), F.lit(" "))).alias(
            "brand_trimmed"
        ),
        F.reverse(F.col("p_brand")).alias("brand_reversed"),
        F.initcap(F.lower(F.col("p_type"))).alias("type_title"),
        F.repeat(F.lit("ab"), 3).alias("repeated"),
        F.instr(F.col("p_name"), " ").alias("space_pos"),
    )


_STRING_BATTERY_SQL = """
SELECT p_partkey,
       string_split(p_name, ' ')[1] AS first_word,
       len(string_split(p_name, ' ')) AS n_words,
       list_sort(string_split(p_name, ' '))[1] AS first_sorted_word,
       CAST(regexp_extract(p_brand, '([0-9]+)', 1) AS INTEGER) AS brand_num,
       upper(p_type) AS type_upper,
       concat_ws('|', p_brand, p_type) AS brand_type,
       length(p_name) AS name_len,
       substr(p_name, 1, 4) AS name_prefix,
       p_partkey % 7 AS key_mod7,
       CAST(floor(p_retailprice) AS BIGINT) AS price_floor,
       regexp_replace(p_name, 'o+', 'o', 'g') AS name_squeezed,
       translate(p_type, 'AEIOU', 'aeiou') AS type_lower_vowels,
       lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS key_padded,
       rpad(p_brand, 12, '.') AS brand_padded,
       trim('  ' || p_brand || ' ') AS brand_trimmed,
       reverse(p_brand) AS brand_reversed,
       -- initcap: capitalize first letter of each word
       list_aggregate(list_transform(string_split(lower(p_type), ' '),
           w -> upper(w[1]) || w[2:]), 'string_agg', ' ') AS type_title,
       repeat('ab', 3) AS repeated,
       CAST(instr(p_name, ' ') AS INTEGER) AS space_pos
FROM part
"""


def _date_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2/F4 date assembly, truncation + arithmetic battery over order
    dates. Date-typed results are cast to TIMESTAMP on both engines:
    DATE surfaces as python-object cells in pandas (vs DuckDB's
    datetime64), which driver-side value hashing can't compare."""
    orders = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        F.quarter("o_orderdate").alias("order_quarter"),
        F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
        F.substring(F.col("o_orderdate").cast("string"), 1, 10).alias("date_str"),
        F.datediff(
            F.col("o_orderdate"), F.lit("1995-01-01").cast("date")
        ).alias("days_since_epoch_start"),
        F.date_format(F.col("o_orderdate"), "yyyy-MM").alias("year_month"),
        F.date_add(d, 30).cast("timestamp").alias("due_date"),
        F.add_months(d, 3).cast("timestamp").alias("quarter_later"),
        F.last_day(d).cast("timestamp").alias("month_end"),
        F.dayofweek(d).alias("dow"),
        F.weekofyear(d).alias("week_of_year"),
        F.trunc(d, "year").cast("timestamp").alias("year_start"),
    )


_DATE_BATTERY_SQL = """
SELECT o_orderkey,
       CAST(year(o_orderdate) AS INTEGER) AS order_year,
       CAST(month(o_orderdate) AS INTEGER) AS order_month,
       CAST(day(o_orderdate) AS INTEGER) AS order_day,
       CAST(quarter(o_orderdate) AS INTEGER) AS order_quarter,
       date_trunc('month', o_orderdate) AS month_start,
       substr(CAST(o_orderdate AS VARCHAR), 1, 10) AS date_str,
       CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INTEGER)
           AS days_since_epoch_start,
       strftime(o_orderdate, '%Y-%m') AS year_month,
       CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS TIMESTAMP) AS due_date,
       CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS TIMESTAMP) AS quarter_later,
       CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS month_end,
       CAST(dayofweek(o_orderdate) + 1 AS INTEGER) AS dow,
       CAST(weekofyear(o_orderdate) AS INTEGER) AS week_of_year,
       CAST(date_trunc('year', o_orderdate) AS TIMESTAMP) AS year_start
FROM orders
"""


def _part_collections_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8 EXISTS-over-array (the Attributes/any pattern,
    imagery_store.py:217-220) + F12 map build/merge/filter/interrogate,
    in one pass over part. All collection-valued results are emitted as
    joined strings — the driver's value hasher can't canonicalize array
    cells, and string folding loses nothing semantically."""
    part = load_table(spark, sf_dir, "part")
    toks = F.split(F.col("p_name"), " ")
    m1 = F.create_map(F.lit("brand"), F.col("p_brand"), F.lit("type"), F.col("p_type"))
    m2 = F.create_map(F.lit("size"), F.col("p_size").cast("string"))
    merged = F.map_concat(m1, m2)
    return (
        part.withColumn("has_widget", F.array_contains(toks, "widget"))
        .withColumn(
            "n_long_words",
            F.size(F.filter(toks, lambda t: F.length(t) > 5)),
        )
        .withColumn(
            "upper_words", F.array_join(F.transform(toks, F.upper), ",")
        )
        .filter(F.col("has_widget"))
        .select(
            "p_partkey",
            "has_widget",
            "n_long_words",
            "upper_words",
            F.array_join(F.array_sort(F.map_keys(merged)), ",").alias(
                "keys_sorted"
            ),
            F.size(merged).alias("n_entries"),
            F.element_at(merged, "brand").alias("brand_val"),
            F.array_join(
                F.array_sort(
                    F.map_keys(F.map_filter(merged, lambda k, v: F.length(v) > 5))
                ),
                ",",
            ).alias("long_value_keys"),
        )
    )


_PART_COLLECTIONS_SQL = """
SELECT p_partkey,
       list_contains(string_split(p_name, ' '), 'widget') AS has_widget,
       len(list_filter(string_split(p_name, ' '), t -> length(t) > 5)) AS n_long_words,
       array_to_string(list_transform(string_split(p_name, ' '), t -> upper(t)), ',')
           AS upper_words,
       'brand,size,type' AS keys_sorted,
       3 AS n_entries,
       p_brand AS brand_val,
       array_to_string(list_sort(
           list_filter(
               [CASE WHEN length(p_brand) > 5 THEN 'brand' END,
                CASE WHEN length(CAST(p_size AS VARCHAR)) > 5 THEN 'size' END,
                CASE WHEN length(p_type) > 5 THEN 'type' END],
               k -> k IS NOT NULL)), ',') AS long_value_keys
FROM part
WHERE list_contains(string_split(p_name, ' '), 'widget')
"""


def _fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-similarity join: close DISTINCT part names by Levenshtein
    distance, blocked on the first word (the block-then-verify fuzzy
    shape; exact integer DP both engines). Name-level dedup first —
    raw rows share names heavily, making row-level pairing quadratic
    (measured 11.7M pairs at sf0.1 before the dedup)."""
    part = load_table(spark, sf_dir, "part")
    names = (
        part.select("p_name").distinct().withColumn(
            "blk", F.split(F.col("p_name"), " ").getItem(0)
        )
    )
    a, b = names.alias("a"), names.alias("b")
    return (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.p_name") < F.col("b.p_name")),
        )
        .select(
            F.col("a.p_name").alias("name_a"),
            F.col("b.p_name").alias("name_b"),
            F.levenshtein(F.col("a.p_name"), F.col("b.p_name")).alias("edit_dist"),
        )
        .filter(F.col("edit_dist") <= 4)
    )


_FUZZY_NAME_PAIRS_SQL = """
WITH names AS (SELECT DISTINCT p_name FROM part)
SELECT a.p_name AS name_a, b.p_name AS name_b,
       CAST(levenshtein(a.p_name, b.p_name) AS INTEGER) AS edit_dist
FROM names a
JOIN names b
  ON string_split(a.p_name, ' ')[1] = string_split(b.p_name, ' ')[1]
 AND a.p_name < b.p_name
WHERE levenshtein(a.p_name, b.p_name) <= 4
"""


def _array_transform_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deeper array-function battery: sequence, zip_with, flatten,
    slicing, aggregate — over per-order lineitem quantity arrays."""
    li = load_table(spark, sf_dir, "lineitem")
    per_order = li.groupBy("l_orderkey").agg(
        F.array_sort(
            F.collect_list(F.struct("l_linenumber", "l_quantity"))
        ).alias("lines")
    )
    qtys = F.transform(F.col("lines"), lambda s: s["l_quantity"].cast("bigint"))
    return per_order.select(
        F.col("l_orderkey").alias("orderkey"),
        F.size(qtys).alias("n_lines"),
        F.aggregate(qtys, F.lit(0).cast("bigint"), lambda a, x: a + x).alias(
            "total_qty"
        ),
        F.element_at(qtys, 1).alias("first_qty"),
        F.element_at(qtys, -1).alias("last_qty"),
        F.aggregate(
            F.zip_with(
                qtys,
                F.sequence(F.lit(1), F.size(qtys)).cast("array<bigint>"),
                lambda q, i: q * i,
            ),
            F.lit(0).cast("bigint"),
            lambda a, x: a + x,
        ).alias("weighted_qty"),
        F.array_max(qtys).alias("max_qty"),
        F.array_join(F.slice(qtys, 1, 2).cast("array<string>"), ",").alias(
            "first_two"
        ),
    )


_ARRAY_TRANSFORM_SQL = """
SELECT l_orderkey AS orderkey,
       len(qtys) AS n_lines,
       CAST(list_sum(qtys) AS BIGINT) AS total_qty,
       qtys[1] AS first_qty,
       qtys[-1] AS last_qty,
       CAST(list_sum(list_transform(range(1, len(qtys)+1), i -> qtys[i] * i))
            AS BIGINT) AS weighted_qty,
       list_max(qtys) AS max_qty,
       array_to_string(list_slice(qtys, 1, 2), ',') AS first_two
FROM (
    SELECT l_orderkey,
           list_transform(
               list_sort(list([CAST(l_linenumber AS BIGINT), CAST(l_quantity AS BIGINT)])),
               p -> p[2]
           ) AS qtys
    FROM lineitem
    GROUP BY 1
)
"""


def _scalar_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String + date scalar tiers in one strict row (round 12 —
    merged the former scalar_string_battery + scalar_date_battery
    rows so the registry fits the driver's 50-row correctness
    window; every oracle column of both survives). ``str`` rows are
    the part-table string battery; ``date`` rows the orders-table
    date battery; columns absent from a tier are NULL on its rows,
    identically in the DuckDB restatement."""
    s = _string_battery(spark, sf_dir).withColumn("kind", F.lit("str"))
    d = _date_battery(spark, sf_dir).withColumn("kind", F.lit("date"))
    return s.unionByName(d, allowMissingColumns=True)


_SCALAR_BATTERY_SQL = f"""
SELECT 'str' AS kind, * FROM ({_STRING_BATTERY_SQL})
UNION ALL BY NAME
SELECT 'date' AS kind, * FROM ({_DATE_BATTERY_SQL})
"""


QUERIES: dict[str, Q] = {
    # round 12: the standalone rows are RESTORED beside the merged
    # battery — the optimization brief forbids any driver-declared
    # query from disappearing or renaming (scalar_string_battery and
    # scalar_date_battery are rows 29-30 of CORRECTNESS_r11.json), so
    # both shapes stay declared: the originals bit-for-bit, plus the
    # round-12 battery as an additional row.
    "scalar_string_battery": Q(
        _string_battery, _STRING_BATTERY_SQL,
        "F1/F3/F8/F9 strings + replace/translate/pad/trim/case tier",
    ),
    "scalar_date_battery": Q(
        _date_battery, _DATE_BATTERY_SQL, "F2/F4 date assembly + arithmetic"
    ),
    "scalar_battery": Q(
        _scalar_battery, _SCALAR_BATTERY_SQL,
        "F1-F4/F8/F9 scalar tiers (round 12 — merged "
        "scalar_string_battery + scalar_date_battery): strings + "
        "replace/translate/pad/trim/case over part, date assembly + "
        "arithmetic over orders",
    ),
    "part_collections_battery": Q(
        _part_collections_battery, _PART_COLLECTIONS_SQL,
        "P8 exists-over-arrays + F12 map build/merge/filter",
    ),
    # fuzzy_name_pairs moved into spatial_q.spatial_fuzzy_join_battery
    # (the registry is capped at 50 rows; the battery freed a slot for
    # the spatial-join oracle). _fuzzy_name_pairs itself lives on here.
    "array_transform_battery": Q(_array_transform_battery, _ARRAY_TRANSFORM_SQL, "zip_with/sequence/aggregate arrays"),
}
