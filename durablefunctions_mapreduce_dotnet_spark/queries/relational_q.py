"""Core relational surface: scans, projections, filters, scalar functions,
hash aggregation (plain / distinct / cube / rollup), sort, top-k, set ops,
pivot (SURVEY.md §2.2 rows: Projections/filters, Aggregations, Sorts,
Set operations, Scalar functions).

All built-in DataFrame API — Catalyst supplies pushdown, pruning and the
partial/final agg split the reference hand-wires (SURVEY.md §4.1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numeric import davg, dsum
from ..sources.readers import read_table
from ._sql import davg as sql_davg
from ._sql import dsum as sql_dsum


# --- TPC-H Q1 shape: the canonical multi-agg groupBy -----------------------

def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),  # integer-valued: exact as double
            dsum("l_extendedprice", "sum_base_price"),
            dsum(disc_price, "sum_disc_price"),
            dsum(charge, "sum_charge"),
            (F.sum("l_quantity") / F.count(F.lit(1))).alias("avg_qty"),
            davg("l_extendedprice", "avg_price"),
            davg(F.col("l_discount"), "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


_PRICING_SQL = f"""
SELECT l_returnflag, l_linestatus,
       SUM(l_quantity) AS sum_qty,
       {sql_dsum('l_extendedprice')} AS sum_base_price,
       {sql_dsum('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
       {sql_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
       SUM(l_quantity) / COUNT(*) AS avg_qty,
       {sql_davg('l_extendedprice')} AS avg_price,
       {sql_davg('l_discount')} AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


# --- aggregation variants ---------------------------------------------------

def q_agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        read_table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.countDistinct("o_custkey").alias("n_customers"),
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
            dsum("o_totalprice", "sum_price"),
        )
        .orderBy("o_orderpriority")
    )


_AGG_STATS_SQL = f"""
SELECT o_orderpriority,
       COUNT(*) AS n_orders,
       CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers,
       MIN(o_totalprice) AS min_price,
       MAX(o_totalprice) AS max_price,
       {sql_dsum('o_totalprice')} AS sum_price
FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


def q_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = read_table(spark, sf_dir, "customer")
    return c.select("c_mktsegment").distinct().orderBy("c_mktsegment")


_DISTINCT_SQL = "SELECT DISTINCT c_mktsegment FROM customer ORDER BY c_mktsegment"


def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("sum_qty"))
    )


_CUBE_SQL = """
SELECT l_returnflag, l_linestatus, COUNT(*) AS n, SUM(l_quantity) AS sum_qty
FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
"""


def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = read_table(spark, sf_dir, "nation")
    r = read_table(spark, sf_dir, "region")
    c = read_table(spark, sf_dir, "customer")
    joined = c.join(
        F.broadcast(n), c.c_nationkey == n.n_nationkey
    ).join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    return joined.rollup("r_name", "n_name").agg(F.count(F.lit(1)).alias("n_customers"))


_ROLLUP_SQL = """
SELECT r_name, n_name, COUNT(*) AS n_customers
FROM customer JOIN nation ON c_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
"""


# --- sort / top-k -----------------------------------------------------------

def q_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k = orderBy + limit; Spark plans TakeOrderedAndProject (no full
    sort — a per-partition heap then a driver merge of k·P rows)."""
    return (
        read_table(spark, sf_dir, "orders")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


_TOPK_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
"""


# --- set operations ---------------------------------------------------------

def q_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = read_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = read_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.union(s)


_UNION_ALL_SQL = """
SELECT c_nationkey AS nationkey FROM customer
UNION ALL SELECT s_nationkey AS nationkey FROM supplier
"""


def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = read_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = read_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


_INTERSECT_SQL = """
SELECT c_nationkey AS nationkey FROM customer
INTERSECT SELECT s_nationkey AS nationkey FROM supplier
"""


def q_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = read_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = read_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.exceptAll(s)


_EXCEPT_ALL_SQL = """
SELECT c_nationkey AS nationkey FROM customer
EXCEPT ALL SELECT s_nationkey AS nationkey FROM supplier
"""


# --- scalar functions -------------------------------------------------------

def q_scalar_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = read_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.length("p_name").alias("name_len"),
        F.substring("p_type", 1, 5).alias("type_prefix"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.regexp_extract("p_type", "([A-Za-z]+)$", 1).alias("type_last_word"),
        F.when(F.col("p_size") >= 30, "large")
        .when(F.col("p_size") >= 15, "medium")
        .otherwise("small")
        .alias("size_class"),
        (F.col("p_size") % 7).alias("size_mod"),
        F.abs(F.col("p_retailprice") - 950.0).alias("price_dev"),
    )


_SCALAR_STRING_SQL = """
SELECT p_partkey,
       UPPER(p_name) AS name_upper,
       CAST(LENGTH(p_name) AS INTEGER) AS name_len,
       SUBSTRING(p_type, 1, 5) AS type_prefix,
       CONCAT_WS('|', p_brand, p_type) AS brand_type,
       regexp_extract(p_type, '([A-Za-z]+)$', 1) AS type_last_word,
       CASE WHEN p_size >= 30 THEN 'large'
            WHEN p_size >= 15 THEN 'medium'
            ELSE 'small' END AS size_class,
       p_size % 7 AS size_mod,
       ABS(p_retailprice - 950.0) AS price_dev
FROM part
"""


def q_scalar_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.quarter("o_orderdate").alias("qtr"),
        F.month("o_orderdate").alias("mon"),
        F.dayofmonth("o_orderdate").alias("dom"),
        (F.dayofweek("o_orderdate") - 1).cast("int").alias("dow"),
        # string-typed so the pandas dtype matches DuckDB exactly
        # (Spark ts -> datetime64[ns] vs DuckDB -> [us] otherwise)
        F.date_format(F.date_trunc("month", F.col("o_orderdate")), "yyyy-MM-dd").alias(
            "month_start"
        ),
        F.datediff(F.lit("2002-01-01").cast("date"), F.col("o_orderdate").cast("date")).alias(
            "days_to_2002"
        ),
    )


_SCALAR_DATE_SQL = """
SELECT o_orderkey,
       CAST(year(o_orderdate) AS INTEGER) AS yr,
       CAST(quarter(o_orderdate) AS INTEGER) AS qtr,
       CAST(month(o_orderdate) AS INTEGER) AS mon,
       CAST(day(o_orderdate) AS INTEGER) AS dom,
       CAST(dayofweek(o_orderdate) AS INTEGER) AS dow,
       strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
       CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS INTEGER) AS days_to_2002
FROM orders
"""


def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read_table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k"),
    )


_JSON_SQL = """
SELECT event_id, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k FROM events
"""


def q_json_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT surface (Spark 4's semi-structured type — parse once,
    extract many, no per-extraction reparse like get_json_object):
    ``parse_json`` → ``try_variant_get`` typed extraction, with a
    missing path returning NULL instead of erroring.  The oracle
    mirrors through DuckDB's JSON extraction — same values, the
    engine-native semi-structured path on each side."""
    e = read_table(spark, sf_dir, "events")
    v = F.parse_json("props")
    return e.select(
        "event_id",
        F.try_variant_get(v, "$.k", "int").alias("k_variant"),
        F.try_variant_get(v, "$.missing", "int").alias("missing_val"),
    )


_JSON_VARIANT_SQL = """
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_variant,
       CAST(NULL AS INTEGER) AS missing_val
FROM events
"""


def q_recursive_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4 WITH RECURSIVE — UNION ALL form): a
    BOM-style ancestor walk over a derived acyclic hierarchy (each
    part's parent assembly = partkey div 10), returning every part's
    root assembly and chain depth.  The classic hierarchy/graph-walk
    the iterative-DataFrame operators (connected_components, pagerank)
    otherwise hand-roll — here expressed declaratively and executed by
    Spark's recursion operator; DuckDB runs the identical SQL.  (Spark's
    recursive CTEs are UNION ALL-only, so this surface fits acyclic
    walks; cyclic closures stay with connected_components.)"""
    read_table(spark, sf_dir, "part").createOrReplaceTempView("_rec_part")
    return spark.sql(_RECURSIVE_HIERARCHY_TMPL.format(part="_rec_part"))


_RECURSIVE_HIERARCHY_TMPL = """
WITH RECURSIVE anc(part, anc, depth) AS (
  SELECT CAST(p_partkey AS BIGINT), CAST(p_partkey AS BIGINT), 0 FROM {part}
  UNION ALL
  SELECT part, CAST(floor(anc / 10) AS BIGINT), depth + 1 FROM anc WHERE anc >= 10
)
SELECT part AS p_partkey,
       CAST(MAX(depth) AS BIGINT) AS depth,
       MIN(CASE WHEN anc < 10 THEN anc END) AS root
FROM anc GROUP BY part
"""
_RECURSIVE_HIERARCHY_SQL = _RECURSIVE_HIERARCHY_TMPL.format(part="part")


def q_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType surface: parse the JSON props into map<string,int>, then
    map_keys / element_at / map_concat with a literal map — the Spark
    map-column toolbox over a real column."""
    e = read_table(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,int>")
    enriched = F.map_concat(m, F.create_map(F.lit("bonus"), F.lit(1)))
    return e.select(
        "event_id",
        F.size(m).alias("n_keys"),
        F.element_at(m, "k").alias("k_val"),
        F.array_join(F.array_sort(F.map_keys(enriched)), ",").alias("all_keys"),
        F.element_at(enriched, "bonus").alias("bonus_val"),
    )


# synthetic props is a single-key JSON object {"k": int}
_MAP_FUNCS_SQL = """
SELECT event_id,
       CAST(1 AS INTEGER) AS n_keys,
       CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val,
       'bonus,k' AS all_keys,
       CAST(1 AS INTEGER) AS bonus_val
FROM events
"""


# --- pivot ------------------------------------------------------------------

def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
        .select(
            "o_orderpriority",
            F.coalesce("F", F.lit(0)).alias("n_f"),
            F.coalesce("O", F.lit(0)).alias("n_o"),
            F.coalesce("P", F.lit(0)).alias("n_p"),
        )
        .orderBy("o_orderpriority")
    )


_PIVOT_SQL = """
SELECT o_orderpriority,
       COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_f,
       COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_o,
       COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS n_p
FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


# --- unpivot (melt) ---------------------------------------------------------

def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long melt of the four lineitem measures, then an exact sum
    per (returnflag, measure).  ``unpivot`` is a zero-shuffle narrow op
    (each row expands to 4 in place); the only exchange is the final
    small-key aggregate."""
    li = read_table(spark, sf_dir, "lineitem")
    return (
        li.unpivot(
            ["l_returnflag"],
            ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
            "measure",
            "val",
        )
        .groupBy("l_returnflag", "measure")
        .agg(dsum("val", "total"))
        .orderBy("l_returnflag", "measure")
    )


_UNPIVOT_SQL = f"""
WITH long AS (
  SELECT l_returnflag, 'l_quantity' AS measure, l_quantity AS val FROM lineitem
  UNION ALL SELECT l_returnflag, 'l_extendedprice', l_extendedprice FROM lineitem
  UNION ALL SELECT l_returnflag, 'l_discount', l_discount FROM lineitem
  UNION ALL SELECT l_returnflag, 'l_tax', l_tax FROM lineitem)
SELECT l_returnflag, measure, {sql_dsum('val')} AS total
FROM long GROUP BY l_returnflag, measure ORDER BY l_returnflag, measure
"""


QUERIES = {
    "pricing_summary": q_pricing_summary,
    "unpivot_measures": q_unpivot,
    "agg_stats": q_agg_stats,
    "distinct_segments": q_distinct,
    "cube_flag_status": q_cube,
    "rollup_region_nation": q_rollup,
    "topk_orders": q_topk,
    "setop_union_all": q_union_all,
    "setop_intersect": q_intersect,
    "setop_except_all": q_except_all,
    "scalar_string_funcs": q_scalar_string,
    "scalar_date_funcs": q_scalar_date,
    "json_extract": q_json_extract,
    "json_variant": q_json_variant,
    "recursive_hierarchy": q_recursive_hierarchy,
    "map_funcs": q_map_funcs,
    "pivot_status": q_pivot,
}
ORACLES = {
    "pricing_summary": _PRICING_SQL,
    "agg_stats": _AGG_STATS_SQL,
    "distinct_segments": _DISTINCT_SQL,
    "cube_flag_status": _CUBE_SQL,
    "rollup_region_nation": _ROLLUP_SQL,
    "topk_orders": _TOPK_SQL,
    "setop_union_all": _UNION_ALL_SQL,
    "setop_intersect": _INTERSECT_SQL,
    "setop_except_all": _EXCEPT_ALL_SQL,
    "scalar_string_funcs": _SCALAR_STRING_SQL,
    "scalar_date_funcs": _SCALAR_DATE_SQL,
    "json_extract": _JSON_SQL,
    "json_variant": _JSON_VARIANT_SQL,
    "recursive_hierarchy": _RECURSIVE_HIERARCHY_SQL,
    "map_funcs": _MAP_FUNCS_SQL,
    "pivot_status": _PIVOT_SQL,
    "unpivot_measures": _UNPIVOT_SQL,
}
