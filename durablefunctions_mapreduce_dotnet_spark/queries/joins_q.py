"""Join surface: inner/left/full/semi/anti equi-joins (Catalyst-native,
broadcast-hinted for dimension tables), theta/range band join, and the
composite as-of join (SURVEY.md §2.2 Joins row; §7.2 phase 2)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.joins import asof_join_backward, range_band_join, range_bin_join
from ..sources.readers import read_table
from ._sql import dsum as sql_dsum


def q_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue per nation: the classic star join.  Fact table (lineitem)
    streams; orders→customer→nation sides shrink progressively; nation is
    broadcast so the final join is shuffle-free."""
    li = read_table(spark, sf_dir, "lineitem")
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    n = read_table(spark, sf_dir, "nation")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.sum(rev.cast("decimal(38,6)")).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("n_name")
    )


_JOIN_REVENUE_SQL = f"""
SELECT n_name,
       {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue,
       COUNT(*) AS n_items
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
              JOIN customer ON o_custkey = c_custkey
              JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name ORDER BY n_name
"""


def q_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order counts per customer including zero-order customers."""
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(F.count("o_orderkey").alias("n_orders"))
        .orderBy("c_custkey")
    )


_JOIN_LEFT_SQL = """
SELECT c_custkey, c_name, COUNT(o_orderkey) AS n_orders
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey, c_name ORDER BY c_custkey
"""


def q_join_right(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right outer: every customer preserved from the RIGHT side (same
    answer as join_left_counts mirrored — locks the outer-side
    preservation semantics for the right variant; note the build-side
    rule: a right join can only broadcast its LEFT input)."""
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders")
    return (
        o.join(c, o.o_custkey == c.c_custkey, "right")
        .groupBy("c_custkey", "c_mktsegment")
        .agg(F.count("o_orderkey").alias("n_orders"))
        .orderBy("c_custkey")
    )


_JOIN_RIGHT_SQL = """
SELECT c_custkey, c_mktsegment, COUNT(o_orderkey) AS n_orders
FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
GROUP BY c_custkey, c_mktsegment ORDER BY c_custkey
"""


def q_join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key-salted fact-fact join (lineitem ⋈ orders on orderkey,
    salt spread by line number), aggregated to revenue per order
    priority — the oracle is the PLAIN join, proving salting changes
    the distribution, never the answer."""
    from ..operators.skew import salted_equi_join

    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice", "l_discount"
    )
    o = read_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    joined = salted_equi_join(li, o, "l_orderkey", "l_linenumber", n_salt=8)
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        joined.groupBy("o_orderpriority")
        .agg(
            F.sum(rev.cast("decimal(38,6)")).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("o_orderpriority")
    )


_JOIN_SALTED_SQL = f"""
SELECT o_orderpriority,
       {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue,
       COUNT(*) AS n_items
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with at least one finalized order (left-semi: no row
    multiplication, right side only probed)."""
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    return c.join(o, c.c_custkey == o.o_custkey, "semi").select("c_custkey", "c_name")


_JOIN_SEMI_SQL = """
SELECT c_custkey, c_name FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
"""


def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with no pending ('P') orders — anti-join against a
    filtered right side so the result is non-degenerate at every SF."""
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "P")
    return c.join(o, c.c_custkey == o.o_custkey, "anti").select("c_custkey", "c_name")


_JOIN_ANTI_SQL = """
SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
"""


def q_join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer vs supplier presence per nation (full outer)."""
    c = (
        read_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("ck"))
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )
    s = (
        read_table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("sk"))
        .agg(F.count(F.lit(1)).alias("n_suppliers"))
    )
    return (
        c.join(s, c.ck == s.sk, "full")
        .select(
            F.coalesce("ck", "sk").alias("nationkey"),
            F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
            F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
        )
        .orderBy("nationkey")
    )


_JOIN_FULL_SQL = """
WITH c AS (SELECT c_nationkey AS ck, COUNT(*) AS n_customers FROM customer GROUP BY 1),
     s AS (SELECT s_nationkey AS sk, COUNT(*) AS n_suppliers FROM supplier GROUP BY 1)
SELECT COALESCE(ck, sk) AS nationkey,
       COALESCE(n_customers, 0) AS n_customers,
       COALESCE(n_suppliers, 0) AS n_suppliers
FROM c FULL OUTER JOIN s ON ck = sk ORDER BY nationkey
"""


_BANDS = [(900.0, 930.0, "low"), (930.0, 960.0, "mid"), (960.0, 1000.0, "high")]


def q_join_range_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = read_table(spark, sf_dir, "part")
    bands = spark.createDataFrame(
        _BANDS,
        T.StructType(
            [
                T.StructField("lo", T.DoubleType()),
                T.StructField("hi", T.DoubleType()),
                T.StructField("band", T.StringType()),
            ]
        ),
    )
    return (
        range_band_join(p, bands, "p_retailprice")
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.sum(F.col("p_retailprice").cast("decimal(38,6)")).cast("double").alias("sum_price"),
        )
        .orderBy("band")
    )


_JOIN_RANGE_SQL = f"""
SELECT band, COUNT(*) AS n_parts, {sql_dsum('p_retailprice')} AS sum_price
FROM part
JOIN (VALUES (900.0, 930.0, 'low'), (930.0, 960.0, 'mid'), (960.0, 1000.0, 'high'))
     AS b(lo, hi, band)
  ON p_retailprice >= lo AND p_retailprice < hi
GROUP BY band ORDER BY band
"""


def q_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every purchase event, the user's most recent signup/click/view
    at-or-before it (backward as-of join, >= semantics)."""
    e = read_table(spark, sf_dir, "events")
    purchases = e.where(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    refs = e.where(F.col("event_type") == "signup").select("user_id", "ts", "value")
    out = asof_join_backward(
        purchases, refs, key="user_id", payload={"value": "signup_value"}, inner=True
    )
    # timestamps rendered as microsecond ISO strings so the pandas dtype
    # matches DuckDB exactly (datetime64[ns] vs [us] otherwise)
    ts_fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    return out.select(
        "event_id",
        "user_id",
        F.date_format("ts", ts_fmt).alias("ts"),
        F.date_format("matched_ts", ts_fmt).alias("matched_ts"),
        "signup_value",
    )


_JOIN_ASOF_SQL = """
SELECT p.event_id, p.user_id,
       strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS ts,
       strftime(s.ts, '%Y-%m-%d %H:%M:%S.%f') AS matched_ts,
       s.value AS signup_value
FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
ASOF JOIN (SELECT user_id, ts, value FROM events WHERE event_type = 'signup') s
  ON p.user_id = s.user_id AND p.ts >= s.ts
"""


def q_join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of with a 6-hour max-staleness tolerance (pandas
    merge_asof(tolerance=) semantics): a signup older than the bound no
    longer qualifies and the purchase row drops (inner).  The guard a
    production feature-store lookup needs."""
    e = read_table(spark, sf_dir, "events")
    purchases = e.where(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    refs = e.where(F.col("event_type") == "signup").select("user_id", "ts", "value")
    out = asof_join_backward(
        purchases, refs, key="user_id", payload={"value": "signup_value"},
        inner=True, tolerance=6 * 3600,
    )
    ts_fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    return out.select(
        "event_id",
        "user_id",
        F.date_format("ts", ts_fmt).alias("ts"),
        F.date_format("matched_ts", ts_fmt).alias("matched_ts"),
        "signup_value",
    )


_JOIN_ASOF_TOL_SQL = """
SELECT event_id, user_id, ts, matched_ts, signup_value FROM (
  SELECT p.event_id, p.user_id,
         strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS ts,
         strftime(s.ts, '%Y-%m-%d %H:%M:%S.%f') AS matched_ts,
         s.value AS signup_value,
         p.ts - s.ts AS dist
  FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
  ASOF JOIN (SELECT user_id, ts, value FROM events WHERE event_type = 'signup') s
    ON p.user_id = s.user_id AND p.ts >= s.ts
) WHERE dist <= INTERVAL 6 HOUR
"""


def q_join_multiway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local-supplier revenue per nation inside one region over a date
    window — the classic 6-table snowflake (TPC-H Q5 shape).

    Scale plan: lineitem (the fact) never moves more than once — the
    region→nation filter is broadcast down both dimension arms, orders
    carries the pushed-down date predicate into the scan, and the
    c_nationkey = s_nationkey "local" condition is applied as a post-
    join filter on two already-small broadcast sides.  Catalyst's join
    reordering + AQE pick broadcast-hash for every dimension here;
    only lineitem⋈orders is a true shuffle join at 100 TB.
    """
    li = read_table(spark, sf_dir, "lineitem")
    o = read_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    c = read_table(spark, sf_dir, "customer")
    s = read_table(spark, sf_dir, "supplier")
    n = read_table(spark, sf_dir, "nation")
    r = read_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .where(c.c_nationkey == s.s_nationkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(rev.cast("decimal(38,6)")).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


_JOIN_MULTIWAY_SQL = f"""
SELECT n_name, {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY n_name ORDER BY revenue DESC, n_name
"""


def q_join_range_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Big-to-big range join via interval bucketization
    (operators/joins.py range_bin_join): lineitem prices against
    per-part [retail-5, retail+5) bands — 2000 bands is already past
    sane nested-loop territory, and the binned plan is an ordinary
    shuffled equi-join on the bin id that scales out on BOTH sides.
    Oracle = the plain range predicate (bucketization is pair-exact,
    so the SQL doesn't need to know about bins)."""
    from ..functions.numeric import dsum

    li = read_table(spark, sf_dir, "lineitem").select("l_extendedprice")
    bands = read_table(spark, sf_dir, "part").select(
        "p_partkey",
        (F.col("p_retailprice") - 5).alias("lo"),
        (F.col("p_retailprice") + 5).alias("hi"),
    )
    j = range_bin_join(li, bands, "l_extendedprice", bin_width=10.0)
    return j.groupBy("p_partkey").agg(
        F.count(F.lit(1)).alias("n_in_band"),
        dsum("l_extendedprice", "band_revenue"),
    )


_JOIN_RANGE_BINNED_SQL = f"""
SELECT p_partkey, COUNT(*) AS n_in_band,
       {sql_dsum('l_extendedprice')} AS band_revenue
FROM lineitem JOIN part
  ON l_extendedprice >= p_retailprice - 5 AND l_extendedprice < p_retailprice + 5
GROUP BY p_partkey
"""


def q_join_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-prefiltered join: urgent-order revenue by ship month.  The
    build side (orders WHERE o_orderpriority = '1-URGENT', ~20% of
    orders) is folded into a 32 KiB Bloom filter by a combiner-reduced
    bit_or aggregate (driver collects <= m/64 words REGARDLESS of build
    size — operators.joins.bloom_filter_build), broadcast as one
    array<long> literal, and applied to lineitem MAP-SIDE before the
    exchange: at 100 TB the probe shuffle shrinks to ~selectivity + FPP
    before the exact join runs.  This is the explicit, deterministic
    form of Spark's runtime bloom join — and because the exact join
    removes every false positive, the oracle is the PLAIN join: the
    filter can only affect performance, never the answer (locked by
    this row; the no-false-negative property is pytest-locked in
    tests/test_bloom_join.py)."""
    from ..operators.joins import bloom_filter_build, bloom_might_contain

    li = read_table(spark, sf_dir, "lineitem")
    o = read_table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") == "1-URGENT"
    )
    words = bloom_filter_build(o.select("o_orderkey"), "o_orderkey")
    pre = li.where(bloom_might_contain(words, "l_orderkey"))
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        pre.join(o, pre.l_orderkey == o.o_orderkey)
        .groupBy(F.date_format("l_shipdate", "yyyy-MM").alias("ship_month"))
        .agg(
            F.sum(rev.cast("decimal(38,6)")).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("ship_month")
    )


_JOIN_BLOOM_SQL = f"""
SELECT strftime(l_shipdate, '%Y-%m') AS ship_month,
       {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue,
       COUNT(*) AS n_items
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE o_orderpriority = '1-URGENT'
GROUP BY ship_month ORDER BY ship_month
"""


QUERIES = {
    "join_bloom_prefilter": q_join_bloom_prefilter,
    "join_inner_revenue": q_join_revenue,
    "join_range_binned": q_join_range_binned,
    "join_multiway_region": q_join_multiway,
    "join_left_counts": q_join_left,
    "join_right_counts": q_join_right,
    "join_salted_skew": q_join_salted,
    "join_semi": q_join_semi,
    "join_anti": q_join_anti,
    "join_full_outer": q_join_full,
    "join_range_band": q_join_range_band,
    "join_asof": q_join_asof,
    "join_asof_tolerance": q_join_asof_tolerance,
}
ORACLES = {
    "join_bloom_prefilter": _JOIN_BLOOM_SQL,
    "join_inner_revenue": _JOIN_REVENUE_SQL,
    "join_range_binned": _JOIN_RANGE_BINNED_SQL,
    "join_multiway_region": _JOIN_MULTIWAY_SQL,
    "join_left_counts": _JOIN_LEFT_SQL,
    "join_right_counts": _JOIN_RIGHT_SQL,
    "join_salted_skew": _JOIN_SALTED_SQL,
    "join_semi": _JOIN_SEMI_SQL,
    "join_anti": _JOIN_ANTI_SQL,
    "join_full_outer": _JOIN_FULL_SQL,
    "join_range_band": _JOIN_RANGE_SQL,
    "join_asof": _JOIN_ASOF_SQL,
    "join_asof_tolerance": _JOIN_ASOF_TOL_SQL,
}
