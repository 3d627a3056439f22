"""Raw-SQL query face: the same engine driven entirely through
``spark.sql`` over the registered temp views (sources.readers.
register_views) — proof that a SQL-first user can switch to this repo
without learning the DataFrame API.  Catalyst plans views exactly like
the DataFrame formulations (a view is a named logical plan), so
pushdown/pruning/broadcasts are identical; the TPC-H-shaped bodies
below keep the repo's decimal-sum discipline inline.

Oracles are near-verbatim: both engines get ANSI SQL with identical
literals; only engine-dialect spellings differ (strftime vs
date_format)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources.readers import register_views

_DSUM = "CAST(SUM(CAST({x} AS DECIMAL(38,6))) AS DOUBLE)"


def _sql(spark: SparkSession, sf_dir: str, body: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(body)


_Q3_BODY_TMPL = """
SELECT l_orderkey,
       {dsum} AS revenue,
       {datefmt} AS orderdate,
       o_orderpriority
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, orderdate, l_orderkey
LIMIT 10
"""


def q_sql_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 (shipping priority), adapted to this schema
    (o_orderpriority for the missing o_shippriority): unshipped
    BUILDING-segment orders ranked by pending revenue.  Pure
    ``spark.sql`` over the registered views; the decimal revenue sum
    keeps both engines bit-equal; deterministic l_orderkey tie-break."""
    return _sql(
        spark,
        sf_dir,
        _Q3_BODY_TMPL.format(
            dsum=_DSUM.format(x="l_extendedprice * (1.0 - l_discount)"),
            datefmt="date_format(o_orderdate, 'yyyy-MM-dd')",
        ),
    )


_Q3_ORACLE = _Q3_BODY_TMPL.format(
    dsum=_DSUM.format(x="l_extendedprice * (1.0 - l_discount)"),
    datefmt="strftime(o_orderdate, '%Y-%m-%d')",
)


_Q5_BODY = """
SELECT n_name,
       {dsum} AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n_name
ORDER BY revenue DESC, n_name
""".format(dsum=_DSUM.format(x="l_extendedprice * (1.0 - l_discount)"))


def q_sql_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 (local supplier volume): revenue per ASIA nation where
    the customer and the line's supplier share a nation — the classic
    6-way snowflake join; region/nation/supplier are broadcast-sized
    dims, customer/orders/lineitem shuffle on their keys."""
    return _sql(spark, sf_dir, _Q5_BODY)


_Q10_BODY = """
SELECT c_custkey, c_name,
       {dsum} AS revenue,
       n_name
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""".format(dsum=_DSUM.format(x="l_extendedprice * (1.0 - l_discount)"))


def q_sql_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 (returned-item reporting): customers ranked by revenue
    lost to returns in one year — join-heavy group-by with a dimension
    decoration, ranked top-20 with a key tie-break."""
    return _sql(spark, sf_dir, _Q10_BODY)


_Q4_BODY = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey
      AND l_shipdate > o_orderdate + INTERVAL '60' DAY)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def q_sql_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 (order-priority checking), adapted to this schema (no
    l_commitdate/l_receiptdate, so "late" is a line shipped >60 days
    after the order date): per-priority counts of one quarter's orders
    with at least one late line.  The correlated EXISTS is the
    semi-join shape — Catalyst rewrites it to LeftSemi and the
    lineitem side never multiplies order rows."""
    return _sql(spark, sf_dir, _Q4_BODY)


_Q18_BODY = """
SELECT c_name, c_custkey, o_orderkey,
       {datefmt} AS orderdate,
       {qsum} AS total_qty
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (
  SELECT l_orderkey FROM lineitem
  GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(18,6))) > 270.0)
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate
ORDER BY total_qty DESC, o_orderkey
LIMIT 20
"""


def q_sql_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 (large-volume customers): orders whose total quantity
    clears a threshold, decorated with the customer — the IN-subquery
    over a grouped HAVING (a semi-join against an aggregate), then the
    same aggregate regrouped with the join.  Decimal quantity sums keep
    the HAVING cut and the output bit-equal across engines."""
    return _sql(
        spark,
        sf_dir,
        _Q18_BODY.format(
            qsum=_DSUM.format(x="l_quantity"),
            datefmt="date_format(o_orderdate, 'yyyy-MM-dd')",
        ),
    )


_Q18_ORACLE = _Q18_BODY.format(
    qsum=_DSUM.format(x="l_quantity"),
    datefmt="strftime(o_orderdate, '%Y-%m-%d')",
)


_Q22_BODY = """
SELECT c_nationkey AS nation,
       COUNT(*) AS numcust,
       {bsum} AS totacctbal
FROM customer
WHERE CAST(c_acctbal AS DECIMAL(18,6))
        * (SELECT CAST(COUNT(*) AS DECIMAL(18,0))
           FROM customer WHERE c_acctbal > 0.0)
      > (SELECT SUM(CAST(c_acctbal AS DECIMAL(18,6)))
         FROM customer WHERE c_acctbal > 0.0)
  AND NOT EXISTS (
    SELECT 1 FROM orders
    WHERE o_custkey = c_custkey
      AND o_orderdate >= TIMESTAMP '2000-07-01 00:00:00')
GROUP BY c_nationkey
ORDER BY nation
""".format(bsum=_DSUM.format(x="c_acctbal"))


def q_sql_churn_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 (global sales opportunity), adapted to this schema (no
    c_phone, so the country-code cut becomes per-nation grouping and
    "never ordered" becomes "no order since 2000-07-01" — every
    customer here has SOME order): above-average-balance customers gone
    quiet, by nation.  Exercises the scalar aggregate subquery (twice —
    the avg comparison is cross-multiplied as balance·count > total so
    both sides stay exact decimals; a double AVG would be
    order-dependent) and the NOT EXISTS anti-join."""
    return _sql(spark, sf_dir, _Q22_BODY)


QUERIES = {
    "sql_shipping_priority": q_sql_shipping_priority,
    "sql_local_supplier_volume": q_sql_local_supplier_volume,
    "sql_returned_items": q_sql_returned_items,
    "sql_order_priority": q_sql_order_priority,
    "sql_large_orders": q_sql_large_orders,
    "sql_churn_opportunity": q_sql_churn_opportunity,
}
ORACLES = {
    "sql_shipping_priority": _Q3_ORACLE,
    "sql_local_supplier_volume": _Q5_BODY,
    "sql_returned_items": _Q10_BODY,
    "sql_order_priority": _Q4_BODY,
    "sql_large_orders": _Q18_ORACLE,
    "sql_churn_opportunity": _Q22_BODY,
}
