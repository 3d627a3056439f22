"""Subquery surface: scalar, IN, and correlated subqueries.

The reference has no query language at all (SURVEY.md §3 — the one
"query" is hand-compiled into activity functions), so this surface is
pure Spark-first extension: each pattern is expressed as the DataFrame
composition Catalyst decorrelates/plans best, with the ANSI subquery
form as the DuckDB oracle.

Scale notes: the scalar threshold is a 1-row broadcast (no shuffle of
the fact side); IN-membership is a broadcast semi-join on a
dimension-sized list; the correlated max rides one window per key —
the same single shuffle a groupBy would cost, but without a self-join
of the fact table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.numeric import davg
from ..sources.readers import read_table
from ._sql import davg as sql_davg
from ._sql import dsum as sql_dsum


def q_subq_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders priced above the global average (scalar subquery).

    The aggregate collapses to one row; cross-joining it broadcasts the
    scalar to every partition — the fact table never shuffles."""
    o = read_table(spark, sf_dir, "orders")
    threshold = o.agg(davg("o_totalprice", "thr"))
    return (
        o.crossJoin(F.broadcast(threshold))
        .where(F.col("o_totalprice") > F.col("thr"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


_SUBQ_SCALAR_SQL = f"""
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
WHERE o_totalprice > (SELECT {sql_davg('o_totalprice')} FROM orders)
"""


def q_subq_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers in ASIA (IN-subquery over a two-hop dimension chain) —
    planned as a broadcast left-semi join, zero fact-side shuffle."""
    c = read_table(spark, sf_dir, "customer")
    n = read_table(spark, sf_dir, "nation")
    r = read_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    asia_nations = n.join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey
    ).select("n_nationkey")
    return (
        c.join(F.broadcast(asia_nations), c.c_nationkey == asia_nations.n_nationkey, "semi")
        .select("c_custkey", "c_name", "c_nationkey")
    )


_SUBQ_IN_SQL = """
SELECT c_custkey, c_name, c_nationkey
FROM customer
WHERE c_nationkey IN (
  SELECT n_nationkey FROM nation
  WHERE n_regionkey IN (SELECT r_regionkey FROM region WHERE r_name = 'ASIA'))
"""


def q_subq_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each customer's most expensive order(s) — the correlated-max
    pattern.  A window max costs the same single shuffle as the
    decorrelated groupBy+join but never self-joins the fact table."""
    o = read_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey")
    return (
        o.withColumn("mx", F.max("o_totalprice").over(w))
        .where(F.col("o_totalprice") == F.col("mx"))
        .select("o_custkey", "o_orderkey", "o_totalprice")
    )


_SUBQ_CORRELATED_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice
FROM orders o
WHERE o_totalprice = (SELECT MAX(o2.o_totalprice) FROM orders o2
                      WHERE o2.o_custkey = o.o_custkey)
"""


def q_subq_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery with per-row ORDER BY + LIMIT — the
    top-N-per-group pattern in its declarative SQL form (Spark plans
    the decorrelated equivalent of the rank window; DuckDB runs the
    identical text).  Deterministic: price ties broken on o_orderkey."""
    read_table(spark, sf_dir, "customer").createOrReplaceTempView("_lat_c")
    read_table(spark, sf_dir, "orders").createOrReplaceTempView("_lat_o")
    return spark.sql(
        _SUBQ_LATERAL_TMPL.format(customer="_lat_c", orders="_lat_o")
    )


_SUBQ_LATERAL_TMPL = """
SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
FROM {customer} c, LATERAL (
  SELECT o_orderkey, o_totalprice FROM {orders}
  WHERE o_custkey = c.c_custkey
  ORDER BY o_totalprice DESC, o_orderkey
  LIMIT 2) t
"""
_SUBQ_LATERAL_SQL = _SUBQ_LATERAL_TMPL.format(customer="customer", orders="orders")


def q_subq_having_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11-shaped 'important parts': per-part revenue HAVING a
    share above 1.5× the AVERAGE part's share of global revenue — the
    group-aggregate-vs-global-scalar pattern (HAVING against an
    uncorrelated scalar subquery), with a scale-invariant cut (a fixed
    fraction would empty out as the part count grows with SF).  Both
    sums ride ONE combiner aggregate each; the global total+count is a
    1-row broadcast; revenue decimal-summed so the cut and the emitted
    doubles are engine-exact."""
    from ..functions.numeric import dsum

    li = read_table(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    per_part = li.groupBy("l_partkey").agg(dsum(rev, "part_rev"))
    total = li.agg(
        dsum(rev, "_total"), F.countDistinct("l_partkey").alias("_nparts")
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        .where(
            F.col("part_rev")
            > F.lit(1.5) * F.col("_total") / F.col("_nparts")
        )
        .select(
            "l_partkey",
            F.round("part_rev", 4).alias("part_rev"),
        )
        .orderBy(F.desc("part_rev"), "l_partkey")
    )


_SUBQ_HAVING_GLOBAL_SQL = f"""
WITH per_part AS (
  SELECT l_partkey,
         {sql_dsum("l_extendedprice * (1.0 - l_discount)")} AS part_rev
  FROM lineitem GROUP BY l_partkey
),
total AS (
  SELECT {sql_dsum("l_extendedprice * (1.0 - l_discount)")} AS t,
         CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS nparts
  FROM lineitem
)
SELECT l_partkey, ROUND(part_rev, 4) AS part_rev
FROM per_part CROSS JOIN total
WHERE part_rev > 1.5 * t / nparts
ORDER BY part_rev DESC, l_partkey
"""


QUERIES = {
    "subq_having_global": q_subq_having_global,
    "subq_scalar_avg": q_subq_scalar,
    "subq_in_region": q_subq_in,
    "subq_correlated_max": q_subq_correlated,
    "subq_lateral_topn": q_subq_lateral,
}
ORACLES = {
    "subq_having_global": _SUBQ_HAVING_GLOBAL_SQL,
    "subq_scalar_avg": _SUBQ_SCALAR_SQL,
    "subq_in_region": _SUBQ_IN_SQL,
    "subq_correlated_max": _SUBQ_CORRELATED_SQL,
    "subq_lateral_topn": _SUBQ_LATERAL_SQL,
}
