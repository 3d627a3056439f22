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


_Q2_BODY = """
SELECT DISTINCT s_acctbal, s_name, n_name, p_partkey, p_type,
       l_extendedprice AS min_price
FROM part
JOIN lineitem ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'EUROPE'
  AND p_type = 'PROMO'
  AND p_size <= 25
  AND l_extendedprice = (
    SELECT MIN(l2.l_extendedprice)
    FROM lineitem l2
    JOIN supplier s2 ON s2.s_suppkey = l2.l_suppkey
    JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
    JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
    WHERE l2.l_partkey = p_partkey
      AND r2.r_name = 'EUROPE')
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey, min_price
LIMIT 100
"""


def q_sql_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 (minimum-cost supplier), adapted to this schema (no
    partsupp table, so lineitem is the part×supplier price relation and
    ps_supplycost becomes the line's extended price): for EUROPE
    suppliers of PROMO parts, keep only the (part, supplier) offers
    matching that part's REGION-WIDE minimum price — the canonical
    correlated scalar-MIN subquery.  Catalyst decorrelates it into an
    aggregate-then-join (one extra pass over the filtered lineitem,
    re-using the same join keys); MIN of an untouched double column is
    set-wise exact, so no decimal scaffolding is needed.  DISTINCT
    collapses repeat lines at the same price (partsupp rows are unique
    in real TPC-H; lines are not)."""
    return _sql(spark, sf_dir, _Q2_BODY)


_Q15_BODY = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,6))) AS tr
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1997-07-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, CAST(tr AS DOUBLE) AS total_revenue
FROM supplier
JOIN revenue ON s_suppkey = supplier_no
WHERE tr = (SELECT MAX(tr) FROM revenue)
ORDER BY s_suppkey
"""


def q_sql_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 (top supplier): a revenue view over one half-year of
    lineitem, then the supplier(s) whose revenue equals the view's MAX —
    the view-over-aggregate + scalar-MAX-tie shape (the spec's CREATE
    VIEW spelled as a CTE).  The revenue totals stay DECIMAL(38,6)
    through both the MAX and the equality (exact, order-independent on
    both engines — a double sum here could split the tie differently
    per partitioning); only the output column casts to double."""
    return _sql(spark, sf_dir, _Q15_BODY)


_Q21_BODY = """
SELECT s_name, n_name, COUNT(*) AS numwait
FROM supplier
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders ON o_orderkey = l1.l_orderkey
JOIN nation ON s_nationkey = n_nationkey
WHERE o_orderstatus = 'F'
  AND l1.l_shipdate > o_orderdate + INTERVAL '60' DAY
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey
      AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
    WHERE l3.l_orderkey = l1.l_orderkey
      AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_shipdate > o3.o_orderdate + INTERVAL '60' DAY)
GROUP BY s_name, n_name
ORDER BY numwait DESC, s_name
LIMIT 100
"""


def q_sql_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 (suppliers who kept orders waiting), adapted to this
    schema (no l_commitdate/l_receiptdate, so "late" is shipped >60
    days after the order date — the same lateness rule as the Q4
    adaptation): finished orders where THIS supplier shipped late and
    it was multi-supplier, but no OTHER supplier was late — the
    multi-correlation shape stacking a correlated EXISTS (semi-join
    with a non-equality disjunct) on a correlated NOT EXISTS
    (anti-join).  The inner lateness test joins l3 back to orders o3
    INSIDE the subquery so the only correlated predicate is the
    orderkey equality — the decorrelation-friendly spelling (the spec's
    own l3-local receipt>commit test plays the same role)."""
    return _sql(spark, sf_dir, _Q21_BODY)


QUERIES = {
    "sql_shipping_priority": q_sql_shipping_priority,
    "sql_local_supplier_volume": q_sql_local_supplier_volume,
    "sql_returned_items": q_sql_returned_items,
    "sql_order_priority": q_sql_order_priority,
    "sql_large_orders": q_sql_large_orders,
    "sql_churn_opportunity": q_sql_churn_opportunity,
    "sql_min_cost_supplier": q_sql_min_cost_supplier,
    "sql_top_supplier": q_sql_top_supplier,
    "sql_waiting_suppliers": q_sql_waiting_suppliers,
}
ORACLES = {
    "sql_shipping_priority": _Q3_ORACLE,
    "sql_local_supplier_volume": _Q5_BODY,
    "sql_returned_items": _Q10_BODY,
    "sql_order_priority": _Q4_BODY,
    "sql_large_orders": _Q18_ORACLE,
    "sql_churn_opportunity": _Q22_BODY,
    "sql_min_cost_supplier": _Q2_BODY,
    "sql_top_supplier": _Q15_BODY,
    "sql_waiting_suppliers": _Q21_BODY,
}
