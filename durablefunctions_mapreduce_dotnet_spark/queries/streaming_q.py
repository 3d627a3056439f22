"""Streaming queries — driver-checkable because the memory-sink drain is
synchronous and deterministic (batch-equivalent results)."""

from __future__ import annotations

from ..streaming.stream_ops import (
    streaming_click_attribution,
    streaming_daily_counts,
    streaming_dedup,
    streaming_dedup_watermark,
    streaming_enriched_counts,
    streaming_ewma,
    streaming_first_seen,
    streaming_flagship,
    streaming_join_full_outer,
    streaming_join_left_outer,
    streaming_late_data,
    streaming_running_extrema,
    streaming_running_extrema_apws,
    streaming_session_windows,
    streaming_sessionize,
    streaming_sliding_counts,
)
from ._sql import dsum as sql_dsum


def _ts_ewma_oracle_roundfree() -> str:
    from .timeseries_q import _ewma_oracle_sql

    return _ewma_oracle_sql(round9=False)

_STREAM_DAILY_SQL = f"""
SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, event_type,
       COUNT(*) AS n_events,
       {sql_dsum('value')} AS sum_value
FROM events GROUP BY 1, 2 ORDER BY day, event_type
"""

_STREAM_FLAGSHIP_SQL = """
WITH per AS (
  SELECT event_type AS file, CAST(dayofweek(ts) AS INTEGER) AS dow,
         CAST(SUM(CAST(value AS DECIMAL(38,9))) AS DOUBLE) AS s,
         COUNT(*) AS c
  FROM events
  WHERE value > 0 AND NOT isnan(value) AND NOT isinf(value)
  GROUP BY 1, 2
)
SELECT dow,
       CAST(SUM(CAST(s AS DECIMAL(38,9))) AS DOUBLE) / SUM(c) AS avg_speed
FROM per GROUP BY dow ORDER BY dow
"""

# Each event lands in exactly two 2-day/1-day-slide windows: starts at
# trunc(day)-1d and trunc(day) (Spark windows are epoch-aligned, so the
# daily grid matches date_trunc in the UTC session).
_STREAM_SLIDING_SQL = """
SELECT strftime(date_trunc('day', ts) - k * INTERVAL 1 DAY, '%Y-%m-%d') AS win_start,
       event_type, COUNT(*) AS n_events
FROM events CROSS JOIN (VALUES (0), (1)) AS off(k)
GROUP BY 1, 2 ORDER BY win_start, event_type
"""

# first-seen per user: earliest (ts, event_id) — SQL-expressible, so the
# stateful operator gets the full exact check, not the weaker rows-only one.
_STREAM_FIRST_SEEN_SQL = """
SELECT user_id,
       strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS first_ts,
       event_id AS first_event_id
FROM (SELECT user_id, ts, event_id,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events)
WHERE rn = 1 ORDER BY user_id
"""

# session_window(gap) ≡ the classic lag/cumsum sessionization: a new
# session starts when the gap to the previous event exceeds 30 min;
# session_start is the first event's ts.
_STREAM_SESSION_SQL = """
WITH marked AS (
  SELECT user_id, ts,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   > INTERVAL 30 MINUTE OR
                   LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS is_new
  FROM events
), sess AS (
  SELECT user_id, ts,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS UNBOUNDED PRECEDING) AS sid
  FROM marked
)
SELECT user_id,
       strftime(MIN(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
       COUNT(*) AS n_events
FROM sess GROUP BY user_id, sid ORDER BY user_id, session_start
"""

# APPEND-mode session_window over multi-batch arrival (see
# stream_ops.streaming_sessionize): the same gaps-and-islands
# sessionization as _STREAM_SESSION_SQL — the break rule is STRICTLY
# greater than 30 min (Spark merges windows that merely touch: an
# exactly-30-min gap continues the session) — but only sessions the
# final watermark has CLOSED are emitted: close = last event + 30 min,
# emitted iff close <= max(event time, ms floor) − 2 h.  The <=
# (non-strict, unlike the interval join's strict eviction) and the
# merge-at-exact-gap edge are both pinned empirically by
# tests/test_streaming_sessionize_frontier.py.  tail=False staging
# means no row is ever late-dropped, so no drop model is needed.
_STREAM_SESSIONIZE_SQL = """
WITH wm AS (SELECT MAX(epoch_ms(ts)) - 7200000 AS wf FROM events),
marked AS (
  SELECT user_id, ts,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   > INTERVAL 30 MINUTE OR
                   LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS is_new
  FROM events
), sess AS (
  SELECT user_id, ts,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS UNBOUNDED PRECEDING) AS sid
  FROM marked
), agg AS (
  SELECT user_id,
         strftime(MIN(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
         COUNT(*) AS n_events,
         MAX(epoch_ms(ts)) + 1800000 AS close_ms
  FROM sess GROUP BY user_id, sid
)
SELECT user_id, session_start, n_events
FROM agg CROSS JOIN wm
WHERE close_ms <= wf
ORDER BY user_id, session_start
"""

# stream-stream interval join (views ⋈ clicks within 30 min, same user);
# single-trigger file source => appended pairs equal the batch join
_STREAM_ATTRIB_SQL = """
WITH v AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'view'),
c AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'click'),
p AS (
  SELECT v.user_id, v.event_id AS view_id
  FROM v JOIN c ON v.user_id = c.user_id
   AND c.ts >= v.ts AND c.ts <= v.ts + INTERVAL 30 MINUTE
)
SELECT user_id, COUNT(*) AS n_pairs,
       COUNT(DISTINCT view_id) AS n_attributed_views
FROM p GROUP BY user_id ORDER BY user_id
"""

# stream-static enrichment: the event stream joined to the customer
# dimension (broadcast per micro-batch), per-segment running aggregates
_STREAM_ENRICHED_SQL = f"""
SELECT c.c_mktsegment AS segment, COUNT(*) AS n_events,
       {sql_dsum('e.value')} AS sum_value
FROM events e JOIN customer c ON e.user_id = c.c_custkey
GROUP BY 1 ORDER BY 1
"""

# the doubled stream must collapse back to the original table's counts
_STREAM_DEDUP_SQL = """
SELECT user_id, COUNT(*) AS n_events FROM events GROUP BY user_id ORDER BY user_id
"""

# transformWithState per-key running extrema: last emission per key ==
# the batch GROUP BY (MAX is order-free, so no decimal scaffolding)
_STREAM_EXTREMA_SQL = """
SELECT event_type, MAX(value) AS max_value, COUNT(*) AS n_events
FROM events GROUP BY event_type ORDER BY event_type
"""

# Watermark late-drop lifecycle, mirrored batch-for-batch (see
# stream_ops.streaming_late_data): portable-hash arrival jitter, equal
# arrival-range micro-batches, watermark before batch b = running max
# event-time (ms floor, Spark's EventTimeStats granularity) over prior
# batches minus the 2 h delay, rows dropped once their window end <=
# that watermark, and only windows behind the FINAL watermark emitted
# (append mode).  All integer arithmetic — BIGINT products / `div`
# division on both engines — so the trajectory is hash-exact.
_STREAM_LATE_SQL = f"""
WITH ev AS (
  SELECT event_id, ts, event_type, value,
         epoch_us(ts) + ((event_id * 1103515245 + 12345) % 21600)
           * (CASE WHEN (event_id * 2654435761 + 1013904223) % 50 = 0
                   THEN 32 ELSE 1 END) * 1000000 AS arrival_us
  FROM events
),
bounds AS (
  SELECT MIN(arrival_us) AS lo,
         (MAX(arrival_us) - MIN(arrival_us)) // 8 + 1 AS width
  FROM ev
),
batched AS (
  SELECT ev.*, (arrival_us - lo) // width AS b,
         epoch_ms(date_trunc('day', ts)) + 86400000 AS end_ms
  FROM ev CROSS JOIN bounds
),
batch_max AS (
  SELECT b, MAX(epoch_ms(ts)) AS mx FROM batched GROUP BY b
),
wmk AS (
  -- the LATE-EVENTS watermark for batch b: Spark updates the global
  -- watermark at the END of each batch but filters late rows with the
  -- PREVIOUS batch's value (eventTimeWatermarkForLateEvents vs
  -- ForEviction, SPARK-24634) — so batch b drops against
  -- max(event time over batches <= b-2), hence 2 PRECEDING
  SELECT b,
         MAX(mx) OVER (ORDER BY b
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 2 PRECEDING)
           - 7200000 AS w
  FROM batch_max
),
kept AS (
  SELECT batched.* FROM batched JOIN wmk USING (b)
  WHERE w IS NULL OR end_ms > w
),
frontier AS (SELECT MAX(epoch_ms(ts)) - 7200000 AS wf FROM batched)
SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, event_type,
       COUNT(*) AS n_events, {sql_dsum('value')} AS sum_value
FROM kept CROSS JOIN frontier
WHERE end_ms <= wf
GROUP BY 1, 2 ORDER BY day, event_type
"""

# Stream-stream LEFT OUTER interval join (see
# stream_ops.streaming_join_left_outer): the final emission set equals
# the batch interval join PLUS unmatched views whose join window closed
# STRICTLY before the final global watermark — views whose window is
# still open stay in state and never emit.  tail=False staging means no
# row is ever late-dropped, so the oracle is a pure join predicate + the
# frontier rule.  The frontier mirrors Spark's multipleWatermarkPolicy=
# min: each withWatermark node sees only the rows that pass its
# event_type filter, so the global watermark is the LEAST of the
# per-side max event times (ms floor) minus the 2 h delay — NOT the max
# over all events (click/error/signup rows never advance either side,
# and the two sides' maxima differ by ~32 min at sf0.01).  Both the
# min-of-sides frontier and the strict-< edge are pinned empirically by
# tests/test_streaming_left_outer_frontier.py: a view whose window end
# falls between the two per-side frontiers stays in state, and one whose
# end equals the watermark exactly does too (eviction fires only when
# end < watermark).
_STREAM_LEFT_OUTER_SQL = """
WITH side_max AS (
  SELECT MAX(CASE WHEN event_type = 'view' THEN epoch_ms(ts) END) AS vmax,
         MAX(CASE WHEN event_type = 'purchase' THEN epoch_ms(ts) END) AS bmax
  FROM events
),
frontier AS (
  SELECT CASE WHEN vmax IS NULL OR bmax IS NULL THEN NULL
              ELSE LEAST(vmax, bmax) - 7200000 END AS wf
  FROM side_max
),
v AS (SELECT event_id AS view_id, user_id, ts AS vts
      FROM events WHERE event_type = 'view'),
b AS (SELECT event_id AS buy_id, user_id, ts AS bts
      FROM events WHERE event_type = 'purchase'),
matched AS (
  SELECT v.user_id, v.view_id, b.buy_id
  FROM v JOIN b ON v.user_id = b.user_id
   AND b.bts >= v.vts AND b.bts <= v.vts + INTERVAL 1 DAY
),
unmatched AS (
  SELECT v.user_id, v.view_id, CAST(-1 AS BIGINT) AS buy_id
  FROM v CROSS JOIN frontier
  WHERE NOT EXISTS (
          SELECT 1 FROM b
          WHERE b.user_id = v.user_id
            AND b.bts >= v.vts AND b.bts <= v.vts + INTERVAL 1 DAY)
    AND epoch_ms(v.vts) + 86400000 < wf
)
SELECT user_id, view_id, buy_id FROM matched
UNION ALL
SELECT user_id, view_id, buy_id FROM unmatched
ORDER BY user_id, view_id, buy_id
"""

# Batch-equivalent oracle for the FULL outer stream-stream interval
# join (stream_ops.streaming_join_full_outer): matched pairs = the
# batch interval join; unmatched views use the left-outer frontier rule
# (window end vts + 1 day STRICTLY before the final global watermark);
# unmatched purchases use the symmetric-but-tighter rule — matchable
# views carry vts ∈ [bts − 1 day, bts], so a purchase resolves once the
# watermark strictly passes bts itself.  Same min-of-sides frontier
# (each withWatermark node sees only its event_type's rows).
_STREAM_FULL_OUTER_SQL = """
WITH side_max AS (
  SELECT MAX(CASE WHEN event_type = 'view' THEN epoch_ms(ts) END) AS vmax,
         MAX(CASE WHEN event_type = 'purchase' THEN epoch_ms(ts) END) AS bmax
  FROM events
),
frontier AS (
  SELECT CASE WHEN vmax IS NULL OR bmax IS NULL THEN NULL
              ELSE LEAST(vmax, bmax) - 7200000 END AS wf
  FROM side_max
),
v AS (SELECT event_id AS view_id, user_id, ts AS vts
      FROM events WHERE event_type = 'view'),
b AS (SELECT event_id AS buy_id, user_id, ts AS bts
      FROM events WHERE event_type = 'purchase'),
matched AS (
  SELECT v.user_id, v.view_id, b.buy_id
  FROM v JOIN b ON v.user_id = b.user_id
   AND b.bts >= v.vts AND b.bts <= v.vts + INTERVAL 1 DAY
),
unmatched_v AS (
  SELECT v.user_id, v.view_id, CAST(-1 AS BIGINT) AS buy_id
  FROM v CROSS JOIN frontier
  WHERE NOT EXISTS (
          SELECT 1 FROM b
          WHERE b.user_id = v.user_id
            AND b.bts >= v.vts AND b.bts <= v.vts + INTERVAL 1 DAY)
    AND epoch_ms(v.vts) + 86400000 < wf
),
unmatched_b AS (
  SELECT b.user_id, CAST(-1 AS BIGINT) AS view_id, b.buy_id
  FROM b CROSS JOIN frontier
  WHERE NOT EXISTS (
          SELECT 1 FROM v
          WHERE v.user_id = b.user_id
            AND b.bts >= v.vts AND b.bts <= v.vts + INTERVAL 1 DAY)
    AND epoch_ms(b.bts) < wf
)
SELECT user_id, view_id, buy_id FROM matched
UNION ALL
SELECT user_id, view_id, buy_id FROM unmatched_v
UNION ALL
SELECT user_id, view_id, buy_id FROM unmatched_b
ORDER BY user_id, view_id, buy_id
"""

QUERIES = {
    "streaming_daily_counts": streaming_daily_counts,
    "streaming_dedup": streaming_dedup,
    "streaming_sliding_counts": streaming_sliding_counts,
    "streaming_session_windows": streaming_session_windows,
    "streaming_first_seen": streaming_first_seen,
    "streaming_flagship": streaming_flagship,
    "streaming_click_attribution": streaming_click_attribution,
    "streaming_enriched_counts": streaming_enriched_counts,
    "streaming_running_extrema_apws": streaming_running_extrema_apws,
    "streaming_dedup_watermark": streaming_dedup_watermark,
    "streaming_ewma": streaming_ewma,
    "streaming_late_data": streaming_late_data,
    "streaming_join_left_outer": streaming_join_left_outer,
    "streaming_join_full_outer": streaming_join_full_outer,
    "streaming_sessionize": streaming_sessionize,
}
ORACLES = {
    "streaming_click_attribution": _STREAM_ATTRIB_SQL,
    "streaming_enriched_counts": _STREAM_ENRICHED_SQL,
    "streaming_daily_counts": _STREAM_DAILY_SQL,
    "streaming_dedup": _STREAM_DEDUP_SQL,
    "streaming_sliding_counts": _STREAM_SLIDING_SQL,
    "streaming_session_windows": _STREAM_SESSION_SQL,
    "streaming_first_seen": _STREAM_FIRST_SEEN_SQL,
    "streaming_flagship": _STREAM_FLAGSHIP_SQL,
    "streaming_running_extrema_apws": _STREAM_EXTREMA_SQL,
    "streaming_dedup_watermark": _STREAM_DEDUP_SQL,
    # the batch ts_ewma oracle in its round-free form: the stateful
    # kernel's exact-int division bit-matches HUGEINT->DOUBLE division
    "streaming_ewma": _ts_ewma_oracle_roundfree(),
    "streaming_late_data": _STREAM_LATE_SQL,
    "streaming_join_left_outer": _STREAM_LEFT_OUTER_SQL,
    "streaming_join_full_outer": _STREAM_FULL_OUTER_SQL,
    "streaming_sessionize": _STREAM_SESSIONIZE_SQL,
}

# streaming_running_extrema (transformWithStateInPandas) registers only
# when google.protobuf is importable: the API's state-server protocol
# needs it, and it is absent from this container (pip install
# forbidden).  The operator + oracle + a protobuf-gated pytest exist;
# query AND oracle flip in together so the registry never holds an
# orphan oracle key (tests/test_oracle_parity.py enforces this).
try:  # pragma: no cover - environment-dependent
    import google.protobuf  # noqa: F401

    QUERIES["streaming_running_extrema"] = streaming_running_extrema
    ORACLES["streaming_running_extrema"] = _STREAM_EXTREMA_SQL
except ImportError:
    pass
