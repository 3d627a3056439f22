"""Record-linkage and as-of-direction queries.

The dirty side of the fuzzy join is derived deterministically from
``customer`` with per-row perturbations (delete / substitute / append
one character, keyed on ``c_custkey % 4``) so both engines construct
the identical corrupted corpus and the match set is exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.joins import asof_join_forward
from ..operators.linkage import blocked_fuzzy_join
from ..sources.readers import read_table


def q_join_fuzzy_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link a dirtied copy of customer names back to the clean table:
    block on (nation, market segment, binned account balance) — the
    realistic cheap-attributes blocking pass; binning a numeric
    attribute into the block key is the standard way to keep block
    cardinality ~O(n) so candidates stay linear (125 attribute blocks
    alone leave ~n/125-sized blocks whose quadratic term dominated the
    bench: 4.1 s -> ~0.4 s at sf0.1 with the balance bin added) —
    then keep within-block pairs at edit distance ≤ 1.

    Output is ALL within-threshold pairs (TPC-H-style names differ by
    single digits, so near-miss cross-matches are expected and part of
    the oracle-checked answer — picking a winner is a downstream rank)."""
    c = read_table(spark, sf_dir, "customer")
    bal_bin = F.floor(F.col("c_acctbal") / F.lit(1000.0)).cast("long").alias("bal_bin")
    clean = c.select("c_custkey", "c_name", "c_nationkey", "c_mktsegment", bal_bin)
    m = F.pmod(F.col("c_custkey"), F.lit(4))
    dirty_name = (
        F.when(m == 0, F.col("c_name"))
        .when(m == 1, F.concat(F.substring("c_name", 1, 8), F.expr("substring(c_name, 10)")))
        .when(m == 2, F.concat(F.substring("c_name", 1, 10), F.lit("x"), F.expr("substring(c_name, 12)")))
        .otherwise(F.concat(F.col("c_name"), F.lit("q")))
    )
    dirty = c.select(
        (F.col("c_custkey") + 5_000_000).alias("dirty_id"),
        dirty_name.alias("dirty_name"),
        "c_nationkey",
        "c_mktsegment",
        bal_bin,
    )
    out = blocked_fuzzy_join(
        dirty,
        clean,
        ["c_nationkey", "c_mktsegment", "bal_bin"],
        "dirty_name",
        "c_name",
        max_edit=1,
    )
    return out.select("dirty_id", "c_custkey", "edit_dist").orderBy("dirty_id", "c_custkey")


_FUZZY_SQL = """
WITH dirty AS (
  SELECT c_custkey + 5000000 AS dirty_id,
         CASE c_custkey % 4
           WHEN 0 THEN c_name
           WHEN 1 THEN substr(c_name, 1, 8) || substr(c_name, 10)
           WHEN 2 THEN substr(c_name, 1, 10) || 'x' || substr(c_name, 12)
           ELSE c_name || 'q'
         END AS dirty_name,
         c_nationkey, c_mktsegment,
         CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_bin
  FROM customer
)
SELECT d.dirty_id, c.c_custkey,
       CAST(levenshtein(d.dirty_name, c.c_name) AS BIGINT) AS edit_dist
FROM dirty d
JOIN customer c
  ON d.c_nationkey = c.c_nationkey AND d.c_mktsegment = c.c_mktsegment
 AND d.bal_bin = CAST(floor(c.c_acctbal / 1000.0) AS BIGINT)
WHERE levenshtein(d.dirty_name, c.c_name) <= 1
ORDER BY d.dirty_id, c.c_custkey
"""


def q_join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every error event, the user's NEXT click at-or-after it
    (forward as-of join, <= semantics) with its value carried."""
    e = read_table(spark, sf_dir, "events")
    errors = e.where(F.col("event_type") == "error").select("event_id", "user_id", "ts")
    clicks = e.where(F.col("event_type") == "click").select("user_id", "ts", "value")
    out = asof_join_forward(
        errors, clicks, key="user_id", payload={"value": "next_click_value"}, inner=True
    )
    ts_fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    return out.select(
        "event_id",
        "user_id",
        F.date_format("ts", ts_fmt).alias("ts"),
        F.date_format("matched_ts", ts_fmt).alias("matched_ts"),
        "next_click_value",
    )


_ASOF_FORWARD_SQL = """
SELECT p.event_id, p.user_id,
       strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS ts,
       strftime(s.ts, '%Y-%m-%d %H:%M:%S.%f') AS matched_ts,
       s.value AS next_click_value
FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error') p
ASOF JOIN (SELECT user_id, ts, value FROM events WHERE event_type = 'click') s
  ON p.user_id = s.user_id AND p.ts <= s.ts
"""


def q_join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every error event, the user's CLOSEST click in either time
    direction (nearest as-of; equidistant resolves backward)."""
    from ..operators.joins import asof_join_nearest

    e = read_table(spark, sf_dir, "events")
    errors = e.where(F.col("event_type") == "error").select("event_id", "user_id", "ts")
    clicks = e.where(F.col("event_type") == "click").select("user_id", "ts", "value")
    out = asof_join_nearest(
        errors, clicks, key="user_id", payload={"value": "nearest_click_value"}, inner=True
    )
    ts_fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    return out.select(
        "event_id",
        "user_id",
        F.date_format("ts", ts_fmt).alias("ts"),
        F.date_format("matched_ts", ts_fmt).alias("matched_ts"),
        "nearest_click_value",
    )


_ASOF_NEAREST_SQL = """
WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error'),
c AS (SELECT user_id, ts, value FROM events WHERE event_type = 'click'),
b AS (
  SELECT p.event_id, p.user_id, p.ts, s.ts AS b_ts, s.value AS b_v
  FROM p ASOF LEFT JOIN c s ON p.user_id = s.user_id AND p.ts >= s.ts
),
bf AS (
  SELECT b.*, s2.ts AS f_ts, s2.value AS f_v
  FROM b ASOF LEFT JOIN c s2 ON b.user_id = s2.user_id AND b.ts <= s2.ts
),
pick AS (
  SELECT event_id, user_id, ts,
         CASE WHEN b_ts IS NOT NULL AND (f_ts IS NULL OR
                   epoch_us(ts) - epoch_us(b_ts) <= epoch_us(f_ts) - epoch_us(ts))
              THEN b_ts ELSE f_ts END AS matched_ts,
         CASE WHEN b_ts IS NOT NULL AND (f_ts IS NULL OR
                   epoch_us(ts) - epoch_us(b_ts) <= epoch_us(f_ts) - epoch_us(ts))
              THEN b_v ELSE f_v END AS nearest_click_value
  FROM bf
)
SELECT event_id, user_id,
       strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts,
       strftime(matched_ts, '%Y-%m-%d %H:%M:%S.%f') AS matched_ts,
       nearest_click_value
FROM pick WHERE matched_ts IS NOT NULL
"""


QUERIES = {
    "join_fuzzy_blocked": q_join_fuzzy_blocked,
    "join_asof_forward": q_join_asof_forward,
    "join_asof_nearest": q_join_asof_nearest,
}
ORACLES = {
    "join_fuzzy_blocked": _FUZZY_SQL,
    "join_asof_forward": _ASOF_FORWARD_SQL,
    "join_asof_nearest": _ASOF_NEAREST_SQL,
}
