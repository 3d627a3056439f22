"""Streaming queries — driver-checkable because the memory-sink drain is
synchronous and deterministic (batch-equivalent results)."""

from __future__ import annotations

from ..streaming.stream_ops import streaming_daily_counts, streaming_flagship
from ._sql import dsum as sql_dsum

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

QUERIES = {
    "streaming_daily_counts": streaming_daily_counts,
    "streaming_flagship": streaming_flagship,
}
ORACLES = {
    "streaming_daily_counts": _STREAM_DAILY_SQL,
    "streaming_flagship": _STREAM_FLAGSHIP_SQL,
}
