"""Extended aggregate surface: grouping sets, arg-min/max, exact
percentiles, deterministic statistical moments, boolean/conditional
aggregates, and set-collection.

The reference's only aggregate is the sum/count combiner pair
(``Sample.cs:137-138, 189-199``); everything here is Spark-first
extension.  FP-bearing aggregates ride the exact-decimal power-sum
helpers (functions.numeric) so results are partitioning-independent
and hash-equal to the serial DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.numeric import dsum, grouped_moments, grouped_regression
from ..sources.readers import read_table
from ._sql import dsum as sql_dsum
from ._sql import moments_sql, regression_sql


def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS ((status, priority), (status), ()) — one shuffle,
    Catalyst expands the sets without re-scanning the input."""
    o = read_table(spark, sf_dir, "orders")
    return (
        o.groupingSets(
            [["o_orderstatus", "o_orderpriority"], ["o_orderstatus"], []],
            "o_orderstatus",
            "o_orderpriority",
        )
        .agg(F.count(F.lit(1)).alias("n"), dsum("o_totalprice", "total"))
        .orderBy("o_orderstatus", "o_orderpriority")
    )


_GROUPING_SETS_SQL = f"""
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n, {sql_dsum('o_totalprice')} AS total
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
ORDER BY o_orderstatus, o_orderpriority
"""


def q_argminmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cheapest/priciest order key per priority.  ``min_by`` is
    nondeterministic under price ties, so the engine form is a struct
    min/max — lexicographic (price, key) makes the tie-break explicit
    and the result reproducible under any partitioning."""
    o = read_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.min(F.struct("o_totalprice", "o_orderkey"))["o_orderkey"].alias("cheapest_key"),
            F.max(F.struct("o_totalprice", "o_orderkey"))["o_orderkey"].alias("priciest_key"),
        )
        .orderBy("o_orderpriority")
    )


_ARGMINMAX_SQL = """
WITH b AS (SELECT o_orderpriority,
                  MIN(o_totalprice) AS min_p, MAX(o_totalprice) AS max_p
           FROM orders GROUP BY 1)
SELECT b.o_orderpriority,
       (SELECT MIN(o_orderkey) FROM orders o
        WHERE o.o_orderpriority = b.o_orderpriority AND o.o_totalprice = b.min_p)
         AS cheapest_key,
       (SELECT MAX(o_orderkey) FROM orders o
        WHERE o.o_orderpriority = b.o_orderpriority AND o.o_totalprice = b.max_p)
         AS priciest_key
FROM b ORDER BY o_orderpriority
"""


def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact continuous percentiles per group.  Both engines use the
    (p·(n−1)) linear-interpolation definition on doubles, so results are
    bit-equal.  At 100 TB swap in ``approx_percentile`` (t-digest; one
    pass, mergeable sketches) — exact percentile materializes the group
    sorted."""
    li = read_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.percentile("l_extendedprice", 0.25).alias("p25"),
            F.percentile("l_extendedprice", 0.5).alias("p50"),
            F.percentile("l_extendedprice", 0.75).alias("p75"),
        )
        .orderBy("l_returnflag")
    )


_PERCENTILES_SQL = """
SELECT l_returnflag,
       quantile_cont(l_extendedprice, 0.25) AS p25,
       quantile_cont(l_extendedprice, 0.5)  AS p50,
       quantile_cont(l_extendedprice, 0.75) AS p75
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


def q_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variance / stddev / correlation per group — two-pass centered with
    exact decimal accumulation (functions.numeric.grouped_moments);
    built-in ``var_samp``/``corr`` stream doubles and drift with
    partitioning, and one-pass power sums are not engine-portable."""
    li = read_table(spark, sf_dir, "lineitem")
    return grouped_moments(
        li, ["l_returnflag"], "l_quantity", "l_extendedprice"
    ).orderBy("l_returnflag")


_MOMENTS_SQL = (
    moments_sql("lineitem", "l_returnflag", "l_quantity", "l_extendedprice")
    + " ORDER BY l_returnflag"
)


def q_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type least-squares trend of value over time
    (REGR_SLOPE / REGR_INTERCEPT / REGR_R2 surface) — two-pass centered
    OLS with exact-decimal accumulation
    (functions.numeric.grouped_regression); the built-in ``regr_*``
    aggregates drift with partitioning and FMA contraction."""
    ev = read_table(spark, sf_dir, "events").select(
        "event_type",
        F.expr("unix_micros(ts) div 1000000").alias("xs"),
        "value",
    )
    return grouped_regression(ev, ["event_type"], "xs", "value").orderBy(
        "event_type"
    )


_REGRESSION_SQL = (
    regression_sql(
        "(SELECT event_type, epoch_us(ts) // 1000000 AS xs, value FROM events)",
        "event_type",
        "xs",
        "value",
    )
    + " ORDER BY event_type"
)


def q_bool_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional and boolean aggregates per nation of customers."""
    c = read_table(spark, sf_dir, "customer")
    return (
        c.groupBy("c_nationkey")
        .agg(
            F.count_if(F.col("c_acctbal") > 0).alias("n_positive"),
            F.bool_and(F.col("c_acctbal") > -1000).alias("all_above_floor"),
            F.bool_or(F.col("c_acctbal") > 9000).alias("any_high"),
        )
        .orderBy("c_nationkey")
    )


_BOOL_AGGS_SQL = """
SELECT c_nationkey,
       COUNT(CASE WHEN c_acctbal > 0 THEN 1 END) AS n_positive,
       bool_and(c_acctbal > -1000) AS all_above_floor,
       bool_or(c_acctbal > 9000) AS any_high
FROM customer GROUP BY c_nationkey ORDER BY c_nationkey
"""


def q_collect_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set collection rendered as a sorted joined string: collect_set's
    order is partition-dependent, so sort before exposing — and a string
    column keeps the driver's value-hash engine-portable."""
    c = read_table(spark, sf_dir, "customer")
    return (
        c.groupBy("c_nationkey")
        .agg(
            F.array_join(F.sort_array(F.collect_set("c_mktsegment")), ",").alias("segments")
        )
        .orderBy("c_nationkey")
    )


_COLLECT_SET_SQL = """
SELECT c_nationkey,
       array_to_string(list_sort(list(DISTINCT c_mktsegment)), ',') AS segments
FROM customer GROUP BY c_nationkey ORDER BY c_nationkey
"""


def q_approx_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch aggregates — the 100 TB path: approx_percentile (t-digest)
    and approx_count_distinct (HLL++) are single-pass and mergeable, so
    they partial-aggregate map-side like sum/count, where exact
    percentile materializes each group sorted and exact distinct
    shuffles every value.  No SQL oracle (sketch internals are
    engine-specific); accuracy is property-tested against the exact
    answers in tests/test_llm_ops.py."""
    li = read_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.approx_percentile("l_extendedprice", 0.5, 10000).alias("p50_approx"),
            F.approx_count_distinct("l_partkey", 0.02).alias("nd_partkey_approx"),
        )
        .orderBy("l_returnflag")
    )


def q_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct counting via Spark 4's bitmap aggregates — the
    scalable alternative to COUNT(DISTINCT) for dense integer keys: keys
    are bucketed into 32768-bit ranges (``bitmap_bucket_number``) and
    each (group, bucket) partial collapses to ONE bitmap
    (``bitmap_construct_agg`` of ``bitmap_bit_position``), so the
    shuffle carries fixed-size bitmaps instead of every distinct raw
    value — the map-side combine COUNT(DISTINCT)'s Expand plan cannot
    do.  Counts are exact (a bit per key), so the plain COUNT(DISTINCT)
    oracle hash-matches."""
    li = read_table(spark, sf_dir, "lineitem")
    per_bucket = (
        li.groupBy(
            "l_returnflag", F.expr("bitmap_bucket_number(l_partkey)").alias("_b")
        )
        .agg(
            F.expr(
                "bitmap_count(bitmap_construct_agg(bitmap_bit_position(l_partkey)))"
            ).alias("_nd")
        )
    )
    return (
        per_bucket.groupBy("l_returnflag")
        .agg(F.sum("_nd").alias("nd_partkey"))
        .orderBy("l_returnflag")
    )


_BITMAP_DISTINCT_SQL = """
SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS nd_partkey
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


def q_hll_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch incremental distinct (Spark 4 DataSketches HLL):
    per-(event_type, day) user sketches — the PERSISTED asset of an
    incremental pipeline: each new day appends one sketch row instead
    of re-scanning history — merged per type with ``hll_union_agg`` and
    estimated, alongside the exact distinct for self-audit.  Rows-only
    contract (the estimate is Spark's HLL implementation — no SQL
    engine reproduces it bit-for-bit); the ≤5% error bound is
    pytest-pinned (tests/test_llm_ops.py)."""
    e = read_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.date_trunc("day", "ts").cast("date").alias("d")
    ).agg(F.hll_sketch_agg("user_id").alias("sk"))
    merged = daily.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("users_est")
    )
    exact = e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("users_exact")
    )
    return (
        merged.join(exact, "event_type")
        .select("event_type", "users_est", "users_exact")
        .orderBy("event_type")
    )


def q_hll_merge_invariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HASH-EXACT merge-algebra check for the HLL sketch tier: the same
    corpus sketched three ways — whole-corpus directly, per-day partials
    unioned, and user_id%13-salted partials unioned — must yield ONE
    estimate, and in the sketch's exact (coupon) regime that estimate
    IS the exact distinct count, so the oracle is plain
    COUNT(DISTINCT).  lgConfigK=14 keeps every test-corpus cardinality
    (≤ ~2k users) in coupon mode, where union is genuinely lossless;
    at production cardinalities the sketch goes dense and union order
    starts to matter by design — that regime is agg_hll_incremental's
    rows-only + error-bound contract.  What this row pins against the
    driver: the partial-agg → union → estimate pipeline (the thing an
    incremental deployment persists) loses NOTHING relative to a full
    rescan, under two different partition shapes."""
    e = read_table(spark, sf_dir, "events")
    lgk = 14
    by_day = (
        e.groupBy("event_type", F.date_trunc("day", "ts").cast("date").alias("d"))
        .agg(F.hll_sketch_agg("user_id", lgk).alias("sk"))
        .groupBy("event_type")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("users_by_day"))
    )
    by_salt = (
        e.groupBy("event_type", (F.col("user_id") % 13).alias("s"))
        .agg(F.hll_sketch_agg("user_id", lgk).alias("sk"))
        .groupBy("event_type")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("users_by_salt"))
    )
    whole = e.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id", lgk)).alias("users_whole")
    )
    return (
        whole.join(by_day, "event_type")
        .join(by_salt, "event_type")
        .select("event_type", "users_whole", "users_by_day", "users_by_salt")
        .orderBy("event_type")
    )


_HLL_MERGE_INVARIANCE_SQL = """
SELECT event_type,
       COUNT(DISTINCT user_id) AS users_whole,
       COUNT(DISTINCT user_id) AS users_by_day,
       COUNT(DISTINCT user_id) AS users_by_salt
FROM events GROUP BY event_type ORDER BY event_type
"""


def q_kll_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable quantile sketches (Spark 4.1 DataSketches KLL): per-day
    value sketches merged per event_type, then p50/p90/p99 read from
    the merged sketch — the incremental-percentile asset (append one
    day's sketch instead of re-scanning history; same pattern as
    agg_hll_incremental).  Rows-only contract; the KLL rank-error bound
    (~1.7% at k=200) vs exact percentiles is pytest-pinned."""
    e = read_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.date_trunc("day", "ts").cast("date").alias("d")
    ).agg(F.kll_sketch_agg_double("value").alias("sk"))
    merged = daily.groupBy("event_type").agg(
        F.kll_merge_agg_double("sk").alias("msk")
    )
    return merged.select(
        "event_type",
        F.round(F.kll_sketch_get_quantile_double("msk", F.lit(0.5)), 6).alias("p50"),
        F.round(F.kll_sketch_get_quantile_double("msk", F.lit(0.9)), 6).alias("p90"),
        F.round(F.kll_sketch_get_quantile_double("msk", F.lit(0.99)), 6).alias("p99"),
    ).orderBy("event_type")


def q_kll_quantiles_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT ground truth for q_kll_quantiles — same table, same
    grouping, same quantile targets (p50/p90/p99 of events.value per
    event_type), computed by discrete rank selection: the value at row
    ⌈q·n⌉ of the ascending sort (percentile_disc semantics).  All
    selection logic is integer (``(q·n + q) div 1`` forms below are
    exact ⌈⌉ arithmetic) and the outputs are COPIES of source doubles —
    no FP arithmetic anywhere, hash-exact with no margin.  This is the
    in-registry audit row for the KLL sketch's rank-error bound (the
    100 TB path stays the mergeable sketch; exact quantiles sort each
    group).

    Plan: one window pass per group (row_number + count over the same
    partitioning rides one sort), then a conditional-max fan-in — no
    self-join, no global sort."""
    from pyspark.sql import Window

    e = read_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    w = Window.partitionBy("event_type").orderBy("value")
    wn = Window.partitionBy("event_type")
    r = e.select(
        "event_type",
        "value",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    pick = lambda num, den: F.max(  # noqa: E731 — value at rank ⌈q·n⌉
        F.when(F.col("rn") == F.expr(f"({num} * n + {num}) div {den}"), F.col("value"))
    )
    return (
        r.groupBy("event_type")
        .agg(
            pick(1, 2).alias("p50"),
            pick(9, 10).alias("p90"),
            pick(99, 100).alias("p99"),
            F.max("n").alias("n_vals"),
        )
        .orderBy("event_type")
    )


# ⌈(num/den)·n⌉ = (num·n + den − 1) // den; for all three targets here
# num == den − 1, so both engines spell it (num·n + num) // den — the
# identical integer expression as the Spark side, hence identical ranks.
_KLL_EXACT_SQL = """
WITH v AS (
  SELECT event_type, value FROM events WHERE value IS NOT NULL
),
r AS (
  SELECT event_type, value,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM v
)
SELECT event_type,
       MAX(CASE WHEN rn = (1 * n + 1) // 2 THEN value END) AS p50,
       MAX(CASE WHEN rn = (9 * n + 9) // 10 THEN value END) AS p90,
       MAX(CASE WHEN rn = (99 * n + 99) // 100 THEN value END) AS p99,
       CAST(MAX(n) AS BIGINT) AS n_vals
FROM r GROUP BY event_type ORDER BY event_type
"""


def q_incremental_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance, proven exact: the maintained
    aggregate (base partial computed over ts < cutoff MERGED with the
    delta partial over ts ≥ cutoff) must equal the full recompute —
    which is precisely the oracle here (plain GROUP BY over everything).
    The partial SUMs stay DECIMAL through the merge (decimal addition
    is associative and exact, so partial-then-merge ≡ one-pass), with
    ONE double cast at the end — the algebra that lets a 100 TB
    pipeline append a day's partial instead of rescanning history.
    Counts merge as integer sums."""
    e = read_table(spark, sf_dir, "events")
    cutoff = F.lit("2024-01-16 00:00:00").cast("timestamp")

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(38,6)")).alias("s"),
        )

    base = partial(e.where(F.col("ts") < cutoff))
    delta = partial(e.where(F.col("ts") >= cutoff))
    return (
        base.unionByName(delta)
        .groupBy("event_type")
        .agg(
            F.sum("n").alias("n_events"),
            F.sum("s").cast("double").alias("sum_value"),
        )
        .orderBy("event_type")
    )


# The oracle IS the full recompute: equality is the IVM correctness
# statement, not a mirrored plan.
_INCREMENTAL_SQL = f"""
SELECT event_type, COUNT(*) AS n_events,
       {sql_dsum('value')} AS sum_value
FROM events GROUP BY event_type ORDER BY event_type
"""


def q_theta_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience-overlap estimation via Theta sketches (Spark 4.1
    DataSketches): per-event-type distinct-user sketches, then
    |view ∩ t| estimated with theta_intersection for every other type —
    set-operation cardinalities from mergeable sketches, the query
    exact methods need a distinct self-join for.  Rows-only contract;
    accuracy vs the exact overlap (agg_audience_overlap) is
    pytest-pinned."""
    e = read_table(spark, sf_dir, "events")
    sk = e.groupBy("event_type").agg(F.theta_sketch_agg("user_id").alias("sk"))
    view = sk.where(F.col("event_type") == "view").select(
        F.col("sk").alias("view_sk")
    )
    return (
        sk.where(F.col("event_type") != "view")
        .crossJoin(F.broadcast(view))
        .select(
            "event_type",
            F.theta_sketch_estimate(
                F.theta_intersection("sk", "view_sk")
            ).alias("overlap_est"),
        )
        .orderBy("event_type")
    )


def q_theta_set_algebra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HASH-EXACT merge-algebra check for the Theta sketch tier (the
    agg_hll_merge_invariance pattern applied to SET OPERATIONS): two
    genuinely different per-type audiences — A = users with
    user_id%3=0, B = users with user_id%4=0 (so A∩B is the %12 slice,
    neither containing the other) — are sketched from user_id%13-salted
    PARTIALS, theta_union_agg-merged, then intersected / differenced /
    unioned.  In the sketch's exact regime (every test-corpus audience
    ≪ the 4096-entry nominal), Theta set operations are lossless set
    algebra, so the oracle is the literal COUNT(DISTINCT ...) set
    arithmetic.  What this row pins: partials → union → set-op →
    estimate loses nothing vs a full rescan — the mergeable-audience
    contract a 100 TB overlap deployment relies on; the estimator
    regime stays rows-only under agg_theta_overlap."""
    e = read_table(spark, sf_dir, "events")
    def sketch(pred):
        return (
            e.where(pred)
            .groupBy("event_type", (F.col("user_id") % 13).alias("s"))
            .agg(F.theta_sketch_agg("user_id").alias("sk"))
            .groupBy("event_type")
            .agg(F.theta_union_agg("sk").alias("sk"))
        )
    a = sketch(F.col("user_id") % 3 == 0).withColumnRenamed("sk", "ask")
    b = sketch(F.col("user_id") % 4 == 0).withColumnRenamed("sk", "bsk")
    return (
        a.join(b, "event_type")
        .select(
            "event_type",
            F.theta_sketch_estimate(F.theta_intersection("ask", "bsk")).alias("n_both"),
            F.theta_sketch_estimate(F.theta_difference("ask", "bsk")).alias("n_a_only"),
            F.theta_sketch_estimate(F.theta_union("ask", "bsk")).alias("n_either"),
        )
        .orderBy("event_type")
    )


_THETA_SET_ALGEBRA_SQL = """
WITH u AS (SELECT DISTINCT event_type, user_id FROM events)
SELECT event_type,
       COUNT(DISTINCT CASE WHEN user_id % 3 = 0 AND user_id % 4 = 0
                           THEN user_id END) AS n_both,
       COUNT(DISTINCT CASE WHEN user_id % 3 = 0 AND user_id % 4 <> 0
                           THEN user_id END) AS n_a_only,
       COUNT(DISTINCT CASE WHEN user_id % 3 = 0 OR user_id % 4 = 0
                           THEN user_id END) AS n_either
FROM u GROUP BY event_type ORDER BY event_type
"""


def q_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT audience overlap — the ground truth q_theta_overlap
    estimates: distinct users per event type intersected with the
    'view' audience via one distinct self-join.  Integer counts,
    hash-exact."""
    e = read_table(spark, sf_dir, "events")
    ut = e.select("event_type", "user_id").distinct()
    view = ut.where(F.col("event_type") == "view").select("user_id")
    return (
        ut.where(F.col("event_type") != "view")
        .join(view, "user_id", "left_semi")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("overlap"))
        .orderBy("event_type")
    )


_AUDIENCE_OVERLAP_SQL = """
WITH ut AS (SELECT DISTINCT event_type, user_id FROM events),
v AS (SELECT user_id FROM ut WHERE event_type = 'view')
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS overlap
FROM ut
WHERE event_type != 'view' AND user_id IN (SELECT user_id FROM v)
GROUP BY event_type
ORDER BY event_type
"""


def q_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact WEIGHTED (lower) median per group: the smallest
    l_extendedprice whose cumulative l_quantity weight reaches half the
    group's total — the quantity-weighted price midpoint (a revenue
    analyst's median price per sold unit, not per line).  Spark has no
    weighted-percentile aggregate; the composition is ONE per-group
    window pass over exact decimal cumulative weights + a min over
    qualifying rows — integers/decimals all the way, hash-exact with no
    FP scaffolding (the lower-median rule avoids interpolation
    entirely)."""
    li = read_table(spark, sf_dir, "lineitem")
    wq = F.col("l_quantity").cast("decimal(38,6)")
    wcum = Window.partitionBy("l_returnflag").orderBy(
        "l_extendedprice", "l_orderkey", "l_linenumber"
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wtot = Window.partitionBy("l_returnflag")
    ranked = li.select(
        "l_returnflag",
        "l_extendedprice",
        F.sum(wq).over(wcum).alias("_cum"),
        F.sum(wq).over(wtot).alias("_tot"),
    )
    return (
        ranked.where(F.col("_cum") * 2 >= F.col("_tot"))
        .groupBy("l_returnflag")
        .agg(F.min("l_extendedprice").alias("weighted_median_price"))
        .orderBy("l_returnflag")
    )


_WEIGHTED_MEDIAN_SQL = """
WITH ranked AS (
  SELECT l_returnflag, l_extendedprice,
         SUM(CAST(l_quantity AS DECIMAL(38,6))) OVER (
           PARTITION BY l_returnflag
           ORDER BY l_extendedprice, l_orderkey, l_linenumber
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         SUM(CAST(l_quantity AS DECIMAL(38,6))) OVER (
           PARTITION BY l_returnflag) AS tot
  FROM lineitem
)
SELECT l_returnflag, MIN(l_extendedprice) AS weighted_median_price
FROM ranked WHERE cum * 2 >= tot
GROUP BY l_returnflag ORDER BY l_returnflag
"""


def q_listagg_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI LISTAGG ... WITHIN GROUP (Spark 4.1): per-nation customer
    market segments as an ORDER-BY-deterministic delimited string —
    unlike collect_list, the within-group sort makes the aggregate
    partition-order-invariant by construction (duplicates preserved,
    secondary c_custkey tie-break pins equal segments).  Mirrors
    DuckDB's string_agg ORDER BY; hash-exact."""
    c = read_table(spark, sf_dir, "customer")
    return (
        c.where(F.col("c_custkey") % 10 == 0)
        .groupBy("c_nationkey")
        .agg(
            F.expr(
                "listagg(c_mktsegment, ',') WITHIN GROUP "
                "(ORDER BY c_mktsegment, c_custkey)"
            ).alias("segments")
        )
        .orderBy("c_nationkey")
    )


_LISTAGG_SQL = """
SELECT c_nationkey,
       string_agg(c_mktsegment, ',' ORDER BY c_mktsegment, c_custkey) AS segments
FROM customer WHERE c_custkey % 10 = 0
GROUP BY c_nationkey ORDER BY c_nationkey
"""


def q_agg_mode_value_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic MODE per group: the most frequent integer value
    bucket per event_type, ties broken toward the LOWEST bucket.
    Built-in ``mode()`` is non-deterministic on ties in both engines,
    so the argmax rides ``max(struct(cnt, -bucket))`` over exact
    integer counts — one combiner groupBy then a tiny per-group max,
    no window over the corpus; the oracle spells the same policy as a
    rank."""
    e = read_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    b = e.groupBy(
        "event_type", F.floor("value").cast("bigint").alias("bucket")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    top = b.groupBy("event_type").agg(
        F.max(F.struct(F.col("cnt"), (-F.col("bucket")).alias("nb"))).alias("m")
    )
    return top.select(
        "event_type",
        (-F.col("m.nb")).alias("mode_bucket"),
        F.col("m.cnt").alias("cnt"),
    ).orderBy("event_type")


_MODE_BUCKET_SQL = """
WITH b AS (
  SELECT event_type, CAST(floor(value) AS BIGINT) AS bucket, COUNT(*) AS cnt
  FROM events WHERE value IS NOT NULL GROUP BY 1, 2
),
r AS (
  SELECT *, row_number() OVER (PARTITION BY event_type
                               ORDER BY cnt DESC, bucket ASC) AS rn
  FROM b
)
SELECT event_type, bucket AS mode_bucket, cnt FROM r WHERE rn = 1
ORDER BY event_type
"""


QUERIES = {
    "agg_mode_value_bucket": q_agg_mode_value_bucket,
    "agg_hll_incremental": q_hll_incremental,
    "agg_hll_merge_invariance": q_hll_merge_invariance,
    "agg_theta_set_algebra": q_theta_set_algebra,
    "agg_listagg_ordered": q_listagg_ordered,
    "agg_weighted_median": q_weighted_median,
    "agg_kll_quantiles": q_kll_quantiles,
    "agg_kll_quantiles_exact": q_kll_quantiles_exact,
    "agg_incremental_maintenance": q_incremental_maintenance,
    "agg_theta_overlap": q_theta_overlap,
    "agg_audience_overlap": q_audience_overlap,
    "agg_grouping_sets": q_grouping_sets,
    "agg_bitmap_distinct": q_bitmap_distinct,
    "agg_approx_sketches": q_approx_sketches,
    "agg_argminmax": q_argminmax,
    "agg_percentiles": q_percentiles,
    "agg_moments": q_moments,
    "agg_regression": q_regression,
    "agg_bool_conditional": q_bool_aggs,
    "agg_collect_set": q_collect_set,
}
ORACLES = {
    "agg_mode_value_bucket": _MODE_BUCKET_SQL,
    "agg_audience_overlap": _AUDIENCE_OVERLAP_SQL,
    "agg_listagg_ordered": _LISTAGG_SQL,
    "agg_weighted_median": _WEIGHTED_MEDIAN_SQL,
    "agg_kll_quantiles_exact": _KLL_EXACT_SQL,
    "agg_hll_merge_invariance": _HLL_MERGE_INVARIANCE_SQL,
    "agg_theta_set_algebra": _THETA_SET_ALGEBRA_SQL,
    "agg_incremental_maintenance": _INCREMENTAL_SQL,
    "agg_grouping_sets": _GROUPING_SETS_SQL,
    "agg_bitmap_distinct": _BITMAP_DISTINCT_SQL,
    "agg_argminmax": _ARGMINMAX_SQL,
    "agg_percentiles": _PERCENTILES_SQL,
    "agg_moments": _MOMENTS_SQL,
    "agg_regression": _REGRESSION_SQL,
    "agg_bool_conditional": _BOOL_AGGS_SQL,
    "agg_collect_set": _COLLECT_SET_SQL,
}
