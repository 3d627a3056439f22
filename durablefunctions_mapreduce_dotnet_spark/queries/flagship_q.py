"""Flagship queries (SURVEY.md §2.1) on the synthetic tables.

``events`` is the trips analogue (FIXTURES.md §2): ``event_type`` ≙ file,
``value`` ≙ speed measure, ``ts`` ≙ pickup time.  DuckDB's ``dayofweek``
is already Sunday=0 (.NET numbering), Spark's needs ``-1``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.flagship import flagship_events, flagship_events_global
from ..sources.readers import read_table


def q_flagship_faithful(spark: SparkSession, sf_dir: str) -> DataFrame:
    return flagship_events(read_table(spark, sf_dir, "events"))


def q_flagship_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    return flagship_events_global(read_table(spark, sf_dir, "events"))


_FAITHFUL_SQL = """
WITH src AS (
  SELECT event_type AS file, CAST(dayofweek(ts) AS INTEGER) AS dow, value AS speed
  FROM events
  WHERE value > 0 AND NOT isnan(value) AND NOT isinf(value)
), per AS (
  SELECT file, dow,
         CAST(SUM(CAST(speed AS DECIMAL(38,9))) AS DOUBLE) AS s,
         COUNT(*) AS c
  FROM src GROUP BY file, dow
), scaffold AS (
  SELECT f.file, CAST(d.dow AS INTEGER) AS dow
  FROM (SELECT DISTINCT event_type AS file FROM events) f
  CROSS JOIN (SELECT unnest(range(7)) AS dow) d
), densified AS (
  SELECT sc.file, sc.dow, COALESCE(p.s / p.c, 0.0) AS file_avg
  FROM scaffold sc LEFT JOIN per p ON sc.file = p.file AND sc.dow = p.dow
)
SELECT dow,
       CAST(SUM(CAST(file_avg AS DECIMAL(38,9))) AS DOUBLE) / COUNT(*) AS avg_speed
FROM densified GROUP BY dow ORDER BY dow
"""

_GLOBAL_SQL = """
SELECT CAST(dayofweek(ts) AS INTEGER) AS dow,
       CAST(SUM(CAST(value AS DECIMAL(38,9))) AS DOUBLE) / COUNT(*) AS avg_speed
FROM events
WHERE value > 0 AND NOT isnan(value) AND NOT isinf(value)
GROUP BY dow ORDER BY dow
"""

QUERIES = {
    "flagship_faithful": q_flagship_faithful,
    "flagship_global": q_flagship_global,
}
ORACLES = {
    "flagship_faithful": _FAITHFUL_SQL,
    "flagship_global": _GLOBAL_SQL,
}
