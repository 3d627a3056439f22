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


_Q6_BODY = """
SELECT {dsum} AS revenue,
       COUNT(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24.0
""".format(dsum=_DSUM.format(x="l_extendedprice * l_discount"))


def q_sql_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 (forecasting revenue change): the canonical
    scan-filter-aggregate — no join at all, so the whole query is one
    parquet scan with every predicate pushed to the reader and a
    partial+final agg; the microbenchmark of pushdown + whole-stage
    codegen (tests/test_plans.py asserts the PushedFilters)."""
    return _sql(spark, sf_dir, _Q6_BODY)


_Q7_BODY = """
SELECT supp_nation, cust_nation, l_year,
       {dsum} AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
         l_extendedprice * (1.0 - l_discount) AS volume
  FROM supplier
  JOIN lineitem ON s_suppkey = l_suppkey
  JOIN orders ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = 'NATION_8' AND n2.n_name = 'NATION_18')
      OR (n1.n_name = 'NATION_18' AND n2.n_name = 'NATION_8'))
    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
) shipping
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
""".format(dsum=_DSUM.format(x="volume"))


def q_sql_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 (volume shipping): bilateral trade volume between two
    nations by ship year — the DISJUNCTIVE join-filter shape (either
    nation may be the supplier side, so the nation pair predicate can't
    collapse to two equi-filters) over a 6-way join with the same tiny
    nation dim joined twice under different aliases (both broadcast)."""
    return _sql(spark, sf_dir, _Q7_BODY)


_Q8_BODY = """
SELECT o_year,
       CAST(SUM(CASE WHEN nation = 'NATION_13' THEN vol_dec
                     ELSE CAST(0.0 AS DECIMAL(38,6)) END) AS DOUBLE)
         / CAST(SUM(vol_dec) AS DOUBLE) AS mkt_share
FROM (
  SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
         CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,6)) AS vol_dec,
         n2.n_name AS nation
  FROM part
  JOIN lineitem ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region ON n1.n_regionkey = r_regionkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'MIDDLE EAST'
    AND p_type = 'STANDARD'
    AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
) all_nations
GROUP BY o_year
ORDER BY o_year
"""


def q_sql_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 (national market share): one nation's share of a
    region's market for one part type, by order year — the deepest
    snowflake in the suite (8-way: part + nation×2 + region dims around
    the lineitem/orders/customer facts) with a conditional-aggregate
    ratio.  Numerator and denominator both accumulate as DECIMAL(38,6)
    (order-free), so the single double division at the end is the only
    FP op — bit-equal across engines, including exact +0.0 shares for
    years where the nation sold nothing."""
    return _sql(spark, sf_dir, _Q8_BODY)


_Q12_BODY = """
SELECT l_linestatus,
       COUNT(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN 1 END) AS high_line_count,
       COUNT(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                  THEN 1 END) AS low_line_count
FROM orders
JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate > o_orderdate + INTERVAL '60' DAY
  AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l_linestatus
ORDER BY l_linestatus
"""


def q_sql_late_lines_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 (shipping modes / order priority), adapted to this
    schema (no l_shipmode/commitdate/receiptdate: the group key becomes
    l_linestatus and "late" is the Q4/Q21 rule — shipped >60 days after
    the order date): pivoted priority counts over late lines.  The
    join predicate l_shipdate > o_orderdate + interval is a NON-equi
    conjunct riding on the orderkey equi-join (post-join filter, never
    a nested-loop), and the CASE-count pivot is one pass."""
    return _sql(spark, sf_dir, _Q12_BODY)


_Q13_BODY = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer
  LEFT JOIN orders ON c_custkey = o_custkey
    AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
) c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


def q_sql_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 (customer distribution): orders-per-customer
    histogram — the LEFT JOIN with an extra non-key join condition
    (priority filter must live IN the join, not WHERE, so orderless
    customers survive as c_count=0) followed by a second aggregation
    over the first's results."""
    return _sql(spark, sf_dir, _Q13_BODY)


_Q14_BODY = """
SELECT CAST(SUM(CASE WHEN p_type = 'PROMO' THEN vol_dec
                     ELSE CAST(0.0 AS DECIMAL(38,6)) END) AS DOUBLE)
         * 100.0 / CAST(SUM(vol_dec) AS DOUBLE) AS promo_revenue_pct
FROM (
  SELECT CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,6)) AS vol_dec,
         p_type
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
) t
"""


def q_sql_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 (promotion effect): PROMO parts' share of one month's
    revenue — conditional-aggregate ratio to a single row.  Decimal
    numerator/denominator, one double multiply+divide at the end."""
    return _sql(spark, sf_dir, _Q14_BODY)


_Q16_BODY = """
SELECT p_brand, p_type, p_size,
       COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM part
JOIN lineitem ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#1'
  AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29, 33, 37, 41, 45, 49)
  AND l_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
LIMIT 40
"""


def q_sql_parts_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 (parts/supplier relationship), adapted to this schema
    (no partsupp — lineitem is the part×supplier relation; no s_comment
    — the excluded-supplier subquery keys on negative account balance):
    distinct supplier counts per part attribute bucket, minus a NOT IN
    blacklist.  Exercises the null-aware anti-join (Spark plans NOT IN
    as NAAJ) under a COUNT(DISTINCT) aggregate."""
    return _sql(spark, sf_dir, _Q16_BODY)


_Q17_BODY = """
SELECT {dsum} / 7.0 AS avg_yearly,
       COUNT(*) AS n_lines
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#1'
  AND l_quantity < (
    SELECT CAST(0.2 AS DOUBLE) * AVG(l2.l_quantity)
    FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
""".format(dsum=_DSUM.format(x="l_extendedprice"))


def q_sql_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 (small-quantity-order revenue): lines under 20% of
    their part's average quantity — the correlated scalar-AVG subquery
    (Catalyst decorrelates to an aggregate re-joined on partkey).
    l_quantity holds integer-valued doubles, so the AVG's sum is exact
    in IEEE regardless of order and the 0.2·avg threshold is the same
    double on both engines; the revenue output rides the decimal sum."""
    return _sql(spark, sf_dir, _Q17_BODY)


_Q19_BODY = """
SELECT {dsum} AS revenue,
       COUNT(*) AS n_lines
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
       AND l_quantity >= 1.0 AND l_quantity <= 21.0)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
       AND l_quantity >= 5.0 AND l_quantity <= 35.0)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
       AND l_quantity >= 10.0 AND l_quantity <= 50.0)
""".format(dsum=_DSUM.format(x="l_extendedprice * (1.0 - l_discount)"))


def q_sql_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 (discounted revenue): three disjunctive brand/size/
    quantity branches — the OR-of-conjuncts shape.  Catalyst splits the
    disjunction: the single-table parts (l_quantity bounds, p_brand/
    p_size bounds) factor into per-side pushable filters while the
    cross-table residual evaluates post-join, so neither scan reads
    rows no branch could accept."""
    return _sql(spark, sf_dir, _Q19_BODY)


_Q9_BODY = """
SELECT nation, o_year,
       {dsum} AS sum_profit
FROM (
  SELECT n_name AS nation,
         CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
         l_extendedprice * (1.0 - l_discount)
           - l_quantity * (p_retailprice * CAST(0.6 AS DOUBLE)) AS amount
  FROM part
  JOIN lineitem ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders ON o_orderkey = l_orderkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE p_name LIKE '%widget%'
) profit
GROUP BY nation, o_year
ORDER BY nation, o_year DESC
""".format(dsum=_DSUM.format(x="amount"))


def q_sql_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 (product-type profit), adapted to this schema (no
    partsupp, so supply cost becomes 60% of the part's list price —
    ps_supplycost's role as a per-part unit cost): profit by supplier
    nation and order year for one part family, via the LIKE-filtered
    5-way join.  The per-row amount (two multiplies, one subtract —
    identical IEEE ops both engines) accumulates as an exact decimal
    sum, so profit totals with CANCELLATION (revenue minus cost) stay
    bit-equal — the shape where a double sum is most fragile."""
    return _sql(spark, sf_dir, _Q9_BODY)


_Q11_BODY = """
WITH val AS (
  SELECT n_name AS nation, l_partkey,
         SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS v
  FROM lineitem
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  GROUP BY n_name, l_partkey
)
SELECT nation, l_partkey AS partkey, CAST(v AS DOUBLE) AS value
FROM val a
WHERE v * 1000 > (SELECT SUM(v) FROM val b WHERE b.nation = a.nation) * 2
ORDER BY value DESC, nation, partkey
LIMIT 50
"""


def q_sql_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 (important stock identification), adapted to this
    schema (no partsupp, so "stock value" is shipped lineitem value per
    (supplier-nation, part) and the spec's single-nation filter becomes
    per-nation correlation): parts whose value exceeds 0.2% of their
    nation's total — the grouped-aggregate-vs-correlated-scalar-share
    shape.  The fraction comparison is cross-multiplied (v·1000 >
    total·2) so BOTH sides stay exact decimals — no double division
    anywhere near the cut."""
    return _sql(spark, sf_dir, _Q11_BODY)


_Q20_BODY = """
WITH sp AS (
  SELECT l_suppkey, l_partkey, SUM(CAST(l_quantity AS DECIMAL(18,6))) AS q
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
  GROUP BY l_suppkey, l_partkey
),
pt AS (SELECT l_partkey, SUM(q) AS tot FROM sp GROUP BY l_partkey)
SELECT s_name, n_name,
       CAST(COUNT(*) AS BIGINT) AS n_dominated_parts
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
JOIN (SELECT l_suppkey, l_partkey FROM sp JOIN pt USING (l_partkey)
      WHERE q * 3 > tot) dom ON dom.l_suppkey = s_suppkey
GROUP BY s_name, n_name
ORDER BY s_name
"""


def q_sql_dominant_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 (potential part promotion), adapted to this schema (no
    partsupp.availqty, so "holds excess stock" becomes "shipped more
    than a third of the part's year volume"): suppliers dominating
    parts, with their dominated-part counts.  The spec's nested
    IN-over-aggregate-threshold is spelled as CTE aggregates joined on
    the part key — semantically the same semi filter, but with NO
    correlated column inside the aggregate (the correlated-HAVING form
    silently rebinds the outer column to the inner scope in some
    engines — observed in DuckDB, where it turned the threshold into a
    global total and returned zero rows)."""
    return _sql(spark, sf_dir, _Q20_BODY)


_MOMENTUM_BODY_TMPL = """
WITH monthly AS (
  SELECT n_name, {month} AS month,
         CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,6)))
              AS DECIMAL(38,6)) AS rev
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  GROUP BY n_name, {month}
)
SELECT n_name, month,
       CAST(rev AS DOUBLE) AS revenue,
       ROUND(
         CAST(rev - LAG(rev) OVER (PARTITION BY n_name ORDER BY month) AS DOUBLE)
           / CAST(LAG(rev) OVER (PARTITION BY n_name ORDER BY month) AS DOUBLE),
         9) + 0.0 AS momentum
FROM monthly
ORDER BY n_name, month
"""


def q_sql_revenue_momentum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue momentum per nation — the window-over-
    aggregate dashboard shape (monthly decimal-exact revenue, LAG, one
    double division per row).  The revenue stays DECIMAL through the
    subtraction so the momentum numerator is exact; first month is NULL
    by construction (LAG of nothing).  Joins: lineitem→orders shuffles
    on orderkey, customer/nation broadcast."""
    return _sql(
        spark,
        sf_dir,
        _MOMENTUM_BODY_TMPL.format(month="date_format(o_orderdate, 'yyyy-MM')"),
    )


_MOMENTUM_ORACLE = _MOMENTUM_BODY_TMPL.format(month="strftime(o_orderdate, '%Y-%m')")


QUERIES = {
    "sql_revenue_momentum": q_sql_revenue_momentum,
    "sql_shipping_priority": q_sql_shipping_priority,
    "sql_local_supplier_volume": q_sql_local_supplier_volume,
    "sql_returned_items": q_sql_returned_items,
    "sql_order_priority": q_sql_order_priority,
    "sql_large_orders": q_sql_large_orders,
    "sql_churn_opportunity": q_sql_churn_opportunity,
    "sql_min_cost_supplier": q_sql_min_cost_supplier,
    "sql_top_supplier": q_sql_top_supplier,
    "sql_waiting_suppliers": q_sql_waiting_suppliers,
    "sql_forecast_revenue": q_sql_forecast_revenue,
    "sql_volume_shipping": q_sql_volume_shipping,
    "sql_market_share": q_sql_market_share,
    "sql_late_lines_priority": q_sql_late_lines_priority,
    "sql_customer_distribution": q_sql_customer_distribution,
    "sql_promo_revenue": q_sql_promo_revenue,
    "sql_parts_supplier_counts": q_sql_parts_supplier_counts,
    "sql_small_quantity_revenue": q_sql_small_quantity_revenue,
    "sql_discounted_revenue": q_sql_discounted_revenue,
    "sql_product_profit": q_sql_product_profit,
    "sql_important_stock": q_sql_important_stock,
    "sql_dominant_suppliers": q_sql_dominant_suppliers,
}
ORACLES = {
    "sql_revenue_momentum": _MOMENTUM_ORACLE,
    "sql_shipping_priority": _Q3_ORACLE,
    "sql_local_supplier_volume": _Q5_BODY,
    "sql_returned_items": _Q10_BODY,
    "sql_order_priority": _Q4_BODY,
    "sql_large_orders": _Q18_ORACLE,
    "sql_churn_opportunity": _Q22_BODY,
    "sql_min_cost_supplier": _Q2_BODY,
    "sql_top_supplier": _Q15_BODY,
    "sql_waiting_suppliers": _Q21_BODY,
    "sql_forecast_revenue": _Q6_BODY,
    "sql_volume_shipping": _Q7_BODY,
    "sql_market_share": _Q8_BODY,
    "sql_late_lines_priority": _Q12_BODY,
    "sql_customer_distribution": _Q13_BODY,
    "sql_promo_revenue": _Q14_BODY,
    "sql_parts_supplier_counts": _Q16_BODY,
    "sql_small_quantity_revenue": _Q17_BODY,
    "sql_discounted_revenue": _Q19_BODY,
    "sql_product_profit": _Q9_BODY,
    "sql_important_stock": _Q11_BODY,
    "sql_dominant_suppliers": _Q20_BODY,
}
