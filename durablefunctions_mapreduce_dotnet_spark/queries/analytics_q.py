"""Event-analytics queries over the ``events`` table: interval
concurrency (sweep-line), funnel conversion, cohort retention.

All three mirror into plain ANSI SQL; timestamps that enter arithmetic
do so as integer microseconds (``unix_micros`` / ``epoch_us``) so no
engine-specific double rounding can diverge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.analytics import cohort_retention, funnel_counts, interval_concurrency
from ..sources.readers import read_table


def q_window_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrently-open intervals per event type, where each event
    opens an interval of ``value`` minutes.  The duration lands in
    integer microseconds via an explicit ``floor`` (Spark's double→long
    cast truncates, DuckDB's rounds — floor is the portable one)."""
    e = read_table(spark, sf_dir, "events").where(F.col("value") > 0)
    start = F.unix_micros(F.col("ts"))
    end = start + F.floor(F.col("value") * F.lit(60_000_000.0)).cast("long")
    return interval_concurrency(e, "event_type", start, end).orderBy("event_type")


_CONCURRENCY_SQL = """
WITH iv AS (
  SELECT event_type, epoch_us(ts) AS s,
         epoch_us(ts) + CAST(floor(value * 60000000.0) AS BIGINT) AS e
  FROM events WHERE value > 0
),
deltas AS (
  SELECT event_type, s AS t, 1 AS d FROM iv
  UNION ALL
  SELECT event_type, e AS t, -1 AS d FROM iv
),
net AS (SELECT event_type, t, SUM(d) AS net FROM deltas GROUP BY 1, 2),
run AS (
  SELECT event_type, t,
         SUM(net) OVER (PARTITION BY event_type ORDER BY t
                        ROWS UNBOUNDED PRECEDING) AS conc
  FROM net
)
SELECT event_type, CAST(conc AS BIGINT) AS peak_concurrency, t AS peak_at_us
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
                                   ORDER BY conc DESC, t) AS rn FROM run)
WHERE rn = 1 ORDER BY event_type
"""


def q_window_concurrency_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GLOBAL peak concurrency over one un-keyed timeline — the
    two-pass range-bucketed sweep (no SinglePartition window,
    plan-asserted); peak extraction is a TakeOrdered top-1."""
    from ..operators.analytics import global_interval_concurrency

    e = read_table(spark, sf_dir, "events").where(F.col("value") > 0)
    start = F.unix_micros(F.col("ts"))
    end = start + F.floor(F.col("value") * F.lit(60_000_000.0)).cast("long")
    tl = global_interval_concurrency(e, start, end)
    return (
        tl.orderBy(F.desc("concurrency"), F.asc("t_us"))
        .limit(1)
        .select(
            F.col("concurrency").alias("peak_concurrency"),
            F.col("t_us").alias("peak_at_us"),
        )
    )


_CONCURRENCY_GLOBAL_SQL = """
WITH iv AS (
  SELECT epoch_us(ts) AS s,
         epoch_us(ts) + CAST(floor(value * 60000000.0) AS BIGINT) AS e
  FROM events WHERE value > 0
),
deltas AS (
  SELECT s AS t, 1 AS d FROM iv
  UNION ALL
  SELECT e AS t, -1 AS d FROM iv
),
net AS (SELECT t, SUM(d) AS net FROM deltas GROUP BY t),
run AS (
  SELECT t, SUM(net) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS conc FROM net
)
SELECT CAST(conc AS BIGINT) AS peak_concurrency, t AS peak_at_us
FROM run ORDER BY conc DESC, t LIMIT 1
"""


_FUNNEL_STEPS = ["view", "click", "purchase"]


def q_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """view → click → purchase ordered-funnel user counts (step k counts
    only users whose step-k event is at-or-after their step-(k-1)
    timestamp)."""
    e = read_table(spark, sf_dir, "events")
    return funnel_counts(e, "user_id", "event_type", "ts", _FUNNEL_STEPS)


_FUNNEL_SQL = """
WITH s1 AS (
  SELECT user_id, MIN(ts) AS t1 FROM events WHERE event_type = 'view' GROUP BY user_id
),
s2 AS (
  SELECT e.user_id, MIN(e.ts) AS t2
  FROM events e JOIN s1 USING (user_id)
  WHERE e.event_type = 'click' AND e.ts >= s1.t1 GROUP BY e.user_id
),
s3 AS (
  SELECT e.user_id, MIN(e.ts) AS t3
  FROM events e JOIN s2 USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts >= s2.t2 GROUP BY e.user_id
)
SELECT * FROM (VALUES
  (CAST(1 AS BIGINT), 'view',     (SELECT COUNT(*) FROM s1)),
  (CAST(2 AS BIGINT), 'click',    (SELECT COUNT(*) FROM s2)),
  (CAST(3 AS BIGINT), 'purchase', (SELECT COUNT(*) FROM s3))
) AS v(step, step_name, n_users)
ORDER BY step
"""


def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct active users per (first-touch cohort day, day offset)."""
    e = read_table(spark, sf_dir, "events")
    return cohort_retention(e, "user_id", "ts")


_RETENTION_SQL = """
WITH f AS (
  SELECT user_id, MIN(date_trunc('day', ts)) AS first_day
  FROM events GROUP BY user_id
)
SELECT strftime(f.first_day, '%Y-%m-%d') AS cohort_day,
       CAST(date_diff('day', f.first_day, date_trunc('day', e.ts)) AS BIGINT) AS day_offset,
       COUNT(DISTINCT e.user_id) AS n_users
FROM events e JOIN f USING (user_id)
GROUP BY 1, 2 ORDER BY 1, 2
"""


def q_window_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 dimension build from the event log: per user, each
    event-type CHANGE opens a validity interval; repeats collapse; the
    latest state stays open (valid_to NULL)."""
    from ..operators.analytics import scd2_intervals

    e = read_table(spark, sf_dir, "events")
    out = scd2_intervals(e, "user_id", "ts", "event_type", "event_id")
    ts_fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    return out.select(
        "user_id",
        "event_type",
        F.date_format("valid_from", ts_fmt).alias("valid_from"),
        F.date_format("valid_to", ts_fmt).alias("valid_to"),
    ).orderBy("user_id", "valid_from")


_SCD2_SQL = """
WITH log AS (
  SELECT user_id, ts, event_id, event_type,
         LAG({'v': event_type}) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events
),
surv AS (
  SELECT user_id, event_type, ts, event_id FROM log
  WHERE prev IS NULL OR NOT (prev.v IS NOT DISTINCT FROM event_type)
)
SELECT user_id, event_type,
       strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS valid_from,
       strftime(LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                '%Y-%m-%d %H:%M:%S.%f') AS valid_to
FROM surv ORDER BY user_id, valid_from
"""


def q_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replay a CDC change log into final state: events become ops per
    user (signup→I, error→D, else U); the last op by (ts, event_id)
    wins, deleted keys vanish.  One argmax-struct hash aggregate —
    no window, no sort."""
    from ..operators.analytics import cdc_apply

    e = read_table(spark, sf_dir, "events")
    log = e.select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.col("event_type") == "signup", F.lit("I"))
        .when(F.col("event_type") == "error", F.lit("D"))
        .otherwise(F.lit("U"))
        .alias("op"),
        "value",
    )
    out = cdc_apply(log, "user_id", "ts", "event_id", payload_cols=["value"])
    return out.select(
        "user_id",
        F.date_format("last_ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("last_ts"),
        "value",
    ).orderBy("user_id")


_CDC_APPLY_SQL = """
WITH log AS (
  SELECT user_id, ts, event_id,
         CASE WHEN event_type = 'signup' THEN 'I'
              WHEN event_type = 'error' THEN 'D'
              ELSE 'U' END AS op,
         value,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
)
SELECT user_id, strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS last_ts, value
FROM log WHERE rn = 1 AND op != 'D'
ORDER BY user_id
"""


def q_diag_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-key skew diagnostic over lineitem.l_suppkey
    (operators.skew.skew_report): top-10 heaviest keys + fixed-point
    distribution stats — the pre-flight measurement that picks plain
    vs broadcast vs salted join at scale.  Integer-only output,
    hash-exact."""
    from ..operators.skew import skew_report

    li = read_table(spark, sf_dir, "lineitem")
    return skew_report(li, ["l_suppkey"], top_n=10).orderBy("rank")


_SKEW_REPORT_SQL = """
WITH counts AS (
  SELECT CAST(l_suppkey AS VARCHAR) AS key, COUNT(*) AS key_count
  FROM lineitem GROUP BY 1
),
stats AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
         CAST(SUM(key_count) AS BIGINT) AS total_rows,
         CAST(MAX(key_count) AS BIGINT) AS max_count
  FROM counts
),
top AS (
  SELECT key, key_count,
         CAST(ROW_NUMBER() OVER (ORDER BY key_count DESC, key ASC) AS BIGINT) AS rank
  FROM counts ORDER BY key_count DESC, key LIMIT 10
)
SELECT key, key_count, n_keys, total_rows, max_count,
       CAST(FLOOR(100 * total_rows / n_keys) AS BIGINT) AS avg_count_x100,
       CAST(FLOOR(100 * max_count * n_keys / total_rows) AS BIGINT) AS skew_ratio_x100,
       rank
FROM top CROSS JOIN stats
ORDER BY rank
"""


def q_pattern_sequence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict view→click→purchase occurrences within 3 days per user
    (operators.analytics.sequence_pattern_matches) — CEP / session-
    replay extraction, one row per occurrence with all step times in
    epoch micros.  Integer output, hash-exact."""
    from ..operators.analytics import sequence_pattern_matches

    e = read_table(spark, sf_dir, "events")
    return sequence_pattern_matches(
        e, "user_id", "event_type", "ts",
        ["view", "click", "purchase"], 3 * 86400,
    ).orderBy("user_id", "t_1")


_PATTERN_SEQ_SQL = """
WITH f AS (
  SELECT user_id, event_type AS t, epoch_us(ts) AS us, event_id AS id
  FROM events WHERE event_type IN ('view', 'click', 'purchase')
),
led AS (
  SELECT user_id, t, us,
         LEAD(t, 1) OVER w AS t1, LEAD(us, 1) OVER w AS us1,
         LEAD(t, 2) OVER w AS t2, LEAD(us, 2) OVER w AS us2
  FROM f WINDOW w AS (PARTITION BY user_id ORDER BY us, id)
)
SELECT user_id, us AS t_1, us1 AS t_2, us2 AS t_3
FROM led
WHERE t = 'view' AND t1 = 'click' AND t2 = 'purchase'
  AND us2 - us <= CAST(3 AS BIGINT) * 86400 * 1000000
ORDER BY user_id, t_1
"""


def q_scd2_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time snapshot series over the SCD2 dimension: each
    user's state (last event_type) at every midnight of the corpus span
    — the as-of lookup a feature store / reporting layer runs against a
    type-2 history.  Composition: scd2_intervals build + a per-user
    day-grid probe (1-row bounds broadcast + sequence explode, no
    cartesian) left-joined into the validity intervals on
    (user, from ≤ probe < to) — per-user interval counts bound the join
    fan-out, no range-bin machinery needed.  Probes before a user's
    first interval keep NULL state."""
    from ..operators.analytics import scd2_intervals

    e = read_table(spark, sf_dir, "events")
    dim = scd2_intervals(e, "user_id", "ts", "event_type", "event_id").select(
        F.col("user_id").alias("d_user"),
        F.col("event_type").alias("state"),
        "valid_from",
        "valid_to",
    )
    bounds = e.agg(
        F.min(F.date_trunc("day", "ts")).cast("date").alias("_d0"),
        F.max(F.date_trunc("day", "ts")).cast("date").alias("_d1"),
    )
    probes = (
        e.select("user_id")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "user_id",
            F.explode(F.sequence("_d0", "_d1")).alias("_day"),
        )
        .select("user_id", F.col("_day").cast("timestamp").alias("_pts"))
    )
    snap = probes.join(
        dim,
        (F.col("user_id") == F.col("d_user"))
        & (F.col("valid_from") <= F.col("_pts"))
        & (F.col("valid_to").isNull() | (F.col("_pts") < F.col("valid_to"))),
        "left",
    )
    return snap.select(
        "user_id",
        F.date_format("_pts", "yyyy-MM-dd").alias("day"),
        "state",
    ).orderBy("user_id", "day")


_SCD2_SNAPSHOT_SQL = """
WITH log AS (
  SELECT user_id, ts, event_id, event_type,
         LAG({'v': event_type}) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events
),
surv AS (
  SELECT user_id, event_type, ts, event_id FROM log
  WHERE prev IS NULL OR NOT (prev.v IS NOT DISTINCT FROM event_type)
),
dim AS (
  SELECT user_id AS d_user, event_type AS state, ts AS valid_from,
         LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
  FROM surv
),
bounds AS (
  SELECT CAST(MIN(date_trunc('day', ts)) AS DATE) AS d0,
         CAST(MAX(date_trunc('day', ts)) AS DATE) AS d1
  FROM events
),
probes AS (
  SELECT u.user_id,
         CAST(CAST(UNNEST(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS TIMESTAMP) AS pts
  FROM (SELECT DISTINCT user_id FROM events) u CROSS JOIN bounds
)
SELECT p.user_id, strftime(p.pts, '%Y-%m-%d') AS day, d.state
FROM probes p
LEFT JOIN dim d
  ON d.d_user = p.user_id
 AND d.valid_from <= p.pts
 AND (d.valid_to IS NULL OR p.pts < d.valid_to)
ORDER BY p.user_id, day
"""


def q_funnel_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution: per user, microseconds from first
    'view' to the first 'purchase' at-or-after it, summarized as
    converter count + exact p25/p50/p75 latency — the question funnel
    COUNTS can't answer (how long conversion takes).  Two min-aggregates
    on one user exchange; percentiles use the (p·(n−1)) interpolation
    both engines share bit-for-bit over exact integer micros."""
    e = read_table(spark, sf_dir, "events")
    v = (
        e.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min(F.unix_micros(F.col("ts").cast("timestamp"))).alias("t_view"))
    )
    p = (
        e.where(F.col("event_type") == "purchase")
        .select("user_id", F.unix_micros(F.col("ts").cast("timestamp")).alias("t_p"))
        .join(v, "user_id")
        .where(F.col("t_p") >= F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("t_p").alias("t_purchase"), F.min("t_view").alias("_tv"))
    )
    lat = p.select((F.col("t_purchase") - F.col("_tv")).alias("lat_us"))
    return lat.agg(
        F.count(F.lit(1)).alias("n_converters"),
        F.round(F.percentile("lat_us", 0.25), 4).alias("p25_us"),
        F.round(F.percentile("lat_us", 0.5), 4).alias("p50_us"),
        F.round(F.percentile("lat_us", 0.75), 4).alias("p75_us"),
    )


_FUNNEL_LATENCY_SQL = """
WITH v AS (
  SELECT user_id, MIN(epoch_us(ts)) AS t_view
  FROM events WHERE event_type = 'view' GROUP BY user_id
),
p AS (
  SELECT e.user_id, MIN(epoch_us(e.ts)) AS t_purchase, MIN(v.t_view) AS tv
  FROM events e JOIN v ON v.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= v.t_view
  GROUP BY e.user_id
),
lat AS (SELECT t_purchase - tv AS lat_us FROM p)
SELECT CAST(COUNT(*) AS BIGINT) AS n_converters,
       ROUND(quantile_cont(lat_us, 0.25), 4) AS p25_us,
       ROUND(quantile_cont(lat_us, 0.5), 4) AS p50_us,
       ROUND(quantile_cont(lat_us, 0.75), 4) AS p75_us
FROM lat
"""


def q_audit_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-system reconciliation checksums — the audit row a pipeline
    publishes so a DOWNSTREAM copy (another engine, another region) can
    verify it holds the same data without shipping it: per source, the
    row count and an order-free content checksum (sum of a 40-bit
    md5-derived integer of ``doc_id|text``).  md5 is bit-standardized,
    so any engine computes the identical checksum — which is exactly
    what makes it a reconciliation primitive rather than a fingerprint
    only this engine can reproduce.  One scan, combiner-reduced; at
    100 TB the checksum shuffles one bigint per group.

    NULL text is coalesced to an explicit sentinel on BOTH engines:
    ``concat_ws`` silently skips NULL arguments while SQL ``||``
    propagates NULL, so without the sentinel a NULL row would be
    checksummed here but dropped from SUM by the mirror."""
    d = read_table(spark, sf_dir, "documents")
    payload = F.concat(
        F.col("doc_id").cast("string"),
        F.lit("|"),
        F.coalesce(F.col("text"), F.lit("<NULL>")),
    )
    chk = F.conv(F.substring(F.md5(payload), 1, 10), 16, 10).cast("bigint")
    return (
        d.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(chk).alias("content_checksum"),
        )
        .orderBy("source")
    )


_AUDIT_CHECKSUM_SQL = """
SELECT source, COUNT(*) AS n_rows,
       CAST(SUM(CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR) || '|' || coalesce(text, '<NULL>')), 1, 10))
                     AS BIGINT)) AS BIGINT) AS content_checksum
FROM documents GROUP BY source ORDER BY source
"""


QUERIES = {
    "audit_checksum_reconcile": q_audit_checksum,
    "diag_skew_report": q_diag_skew_report,
    "pattern_sequence": q_pattern_sequence,
    "window_scd2_snapshot": q_scd2_snapshot,
    "funnel_latency": q_funnel_latency,
    "cdc_apply": q_cdc_apply,
    "window_concurrency": q_window_concurrency,
    "window_concurrency_global": q_window_concurrency_global,
    "funnel_steps": q_funnel_steps,
    "cohort_retention": q_cohort_retention,
    "window_scd2": q_window_scd2,
}
ORACLES = {
    "audit_checksum_reconcile": _AUDIT_CHECKSUM_SQL,
    "diag_skew_report": _SKEW_REPORT_SQL,
    "pattern_sequence": _PATTERN_SEQ_SQL,
    "window_scd2_snapshot": _SCD2_SNAPSHOT_SQL,
    "funnel_latency": _FUNNEL_LATENCY_SQL,
    "cdc_apply": _CDC_APPLY_SQL,
    "window_concurrency": _CONCURRENCY_SQL,
    "window_concurrency_global": _CONCURRENCY_GLOBAL_SQL,
    "funnel_steps": _FUNNEL_SQL,
    "cohort_retention": _RETENTION_SQL,
    "window_scd2": _SCD2_SQL,
}
