"""Flagship queries (SURVEY.md §2.1) on the synthetic tables.

``events`` is the trips analogue (FIXTURES.md §2): ``event_type`` ≙ file,
``value`` ≙ speed measure, ``ts`` ≙ pickup time.  DuckDB's ``dayofweek``
is already Sunday=0 (.NET numbering), Spark's needs ``-1``.
"""

from __future__ import annotations

import os

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.flagship import flagship_events, flagship_events_global, flagship_trips
from ..sources.readers import read_table
from ..sources.trips import list_csv_files, read_trips_csv_faithful

#: committed trips-shaped CSV fixture (tests/fixtures/gen_trips_fixture.py)
#: — the reference's REAL input shape (headered CSV blobs with dirt),
#: exercised end-to-end: S2 naive-split scan + F1 validity rule + flagship.
_TRIPS_GLOB = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "tests", "fixtures", "trips", "*.csv",
)


def q_flagship_faithful(spark: SparkSession, sf_dir: str) -> DataFrame:
    return flagship_events(read_table(spark, sf_dir, "events"))


def q_flagship_csv_faithful(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship over the faithful CSV reader (S2+F1+F2+F3+E1+E2+A1-A3
    end-to-end on real trip-shaped CSV).  The fixture is a committed
    repo path — scale-independent by design, like the reference's fixed
    blob container (Sample.cs:109); ``sf_dir`` is unused."""
    return flagship_trips(
        read_trips_csv_faithful(spark, _TRIPS_GLOB),
        files=list_csv_files(spark, _TRIPS_GLOB),
    )


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

# DuckDB mirror of the faithful CSV path: read_text + manual newline /
# comma split reproduces the reference's naive parser (quote-blind),
# then the same 17-field + int-col0 validity rule, speed expression and
# avg-of-file-averages.  1.0/0.0 is NULL in DuckDB = Spark try_divide.
_CSV_FAITHFUL_SQL = f"""
WITH raw AS (
  SELECT filename AS file, unnest(string_split(content, chr(10))) AS line
  FROM read_text('{_TRIPS_GLOB}')
), fields AS (
  SELECT file, string_split(line, ',') AS f FROM raw
), valid AS (
  SELECT file,
         try_strptime(f[2], '%Y-%m-%d %H:%M:%S') AS pu,
         try_strptime(f[3], '%Y-%m-%d %H:%M:%S') AS dof,
         TRY_CAST(f[5] AS DOUBLE) AS dist
  FROM fields
  WHERE len(f) = 17 AND TRY_CAST(f[1] AS INTEGER) IS NOT NULL
), src AS (
  SELECT file, CAST(dayofweek(pu) AS INTEGER) AS dow,
         dist / ((epoch_us(dof) - epoch_us(pu)) / 3600000000.0) AS speed
  FROM valid WHERE dist > 0
), kept AS (
  SELECT file, dow, speed FROM src
  WHERE NOT isnan(speed) AND NOT isinf(speed)
), per AS (
  SELECT file, dow,
         CAST(SUM(CAST(speed AS DECIMAL(38,9))) AS DOUBLE) AS s, COUNT(*) AS c
  FROM kept GROUP BY file, dow
), scaffold AS (
  SELECT v.file, CAST(d.dow AS INTEGER) AS dow
  FROM (SELECT DISTINCT file FROM raw) v  -- S1 listing universe: pre-validity
  CROSS JOIN (SELECT unnest(range(7)) AS dow) d
), densified AS (
  SELECT sc.file, sc.dow, COALESCE(p.s / p.c, 0.0) AS file_avg
  FROM scaffold sc LEFT JOIN per p ON sc.file = p.file AND sc.dow = p.dow
)
SELECT dow,
       CAST(SUM(CAST(file_avg AS DECIMAL(38,9))) AS DOUBLE) / COUNT(*) AS avg_speed
FROM densified GROUP BY dow ORDER BY dow
"""

def q_flagship_result_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1, literally: the reference's one-row formatted result string
    ``"Sun: …, Mon: …, …"`` (Sample.cs:226-234, README.md:185) as an
    engine result.  3-dp values ride a DECIMAL cast so the double→string
    rendering is engine-portable; ordered concat via array_sort over
    (dow, line) structs — no collect_list order dependence."""
    res = flagship_events(read_table(spark, sf_dir, "events"))
    names = ["Sun", "Mon", "Tue", "Wed", "Thu", "Fri", "Sat"]
    day = F.element_at(F.array(*[F.lit(n) for n in names]), F.col("dow") + 1)
    line = F.concat(
        day, F.lit(": "),
        F.col("avg_speed").cast("decimal(18,3)").cast("string"),
    )
    return res.select(F.struct(F.col("dow"), line.alias("line")).alias("s")).agg(
        F.array_join(
            F.transform(F.array_sort(F.collect_list("s")), lambda x: x["line"]), ", "
        ).alias("result")
    )


_RESULT_STRING_SQL = f"""
WITH res AS ({_FAITHFUL_SQL.replace(';', '')})
SELECT string_agg(
         ['Sun','Mon','Tue','Wed','Thu','Fri','Sat'][dow + 1]
           || ': ' || CAST(CAST(avg_speed AS DECIMAL(18,3)) AS VARCHAR),
         ', ' ORDER BY dow) AS result
FROM res
"""


def dotnet_double_str(x: float) -> str:
    """.NET Core ``double.ToString()`` rendering: shortest round-trip
    digits, NO trailing ``.0`` on integral values, uppercase exponent
    marker.  Python's ``repr`` is the same shortest-round-trip digit
    string (Gay/Ryū produce the unique shortest correctly-rounded
    decimal), so only the formatting differs."""
    r = repr(float(x))
    if r.endswith(".0"):
        r = r[:-2]
    return r.replace("e", "E") if "e" in r else r


def q_flagship_result_string_faithful(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1 byte-literal: the EXACT reference format string
    ``"Sun: {0}, Mon: {1}, Tue : {2}, wed: {3}, Thu: {4}, Fri: {5},
    Sat: {6}"`` (Sample.cs:225-233) — including the stray space in
    ``Tue :``, the lowercase ``wed``, and full-precision doubles as
    .NET's default ``ToString`` renders them.  The per-dow doubles are
    bit-identical across engines (decimal-exact sums — the reason
    flagship_faithful hash-matches), so a shared shortest-round-trip
    stringification is deterministic; the UDF applies the .NET
    formatting rules to those 7 doubles (Arrow-batched, 7 rows)."""

    @F.pandas_udf("string")
    def net_str(s: pd.Series) -> pd.Series:
        return s.apply(dotnet_double_str)

    res = flagship_events(read_table(spark, sf_dir, "events"))
    labels = ["Sun: ", "Mon: ", "Tue : ", "wed: ", "Thu: ", "Fri: ", "Sat: "]
    label = F.element_at(F.array(*[F.lit(s) for s in labels]), F.col("dow") + 1)
    line = F.concat(label, net_str(F.col("avg_speed")))
    return res.select(F.struct(F.col("dow"), line.alias("line")).alias("s")).agg(
        F.array_join(
            F.transform(F.array_sort(F.collect_list("s")), lambda x: x["line"]), ", "
        ).alias("result")
    )


# DuckDB mirror of .NET double rendering: CAST double->VARCHAR is the
# same shortest-round-trip digit string as Python repr; integral values
# go through BIGINT to drop the ".0" .NET never prints.
_NET_FMT = (
    "CASE WHEN {v} = trunc({v}) AND abs({v}) < 1e15 "
    "THEN CAST(CAST({v} AS BIGINT) AS VARCHAR) "
    "ELSE replace(CAST({v} AS VARCHAR), 'e', 'E') END"
)

_RESULT_STRING_FAITHFUL_SQL = f"""
WITH res AS ({_FAITHFUL_SQL.replace(';', '')})
SELECT string_agg(
         ['Sun: ','Mon: ','Tue : ','wed: ','Thu: ','Fri: ','Sat: '][dow + 1]
           || {_NET_FMT.format(v='avg_speed')},
         ', ' ORDER BY dow) AS result
FROM res
"""


QUERIES = {
    "flagship_faithful": q_flagship_faithful,
    "flagship_global": q_flagship_global,
    "flagship_csv_faithful": q_flagship_csv_faithful,
    "flagship_result_string": q_flagship_result_string,
    "flagship_result_string_faithful": q_flagship_result_string_faithful,
}
ORACLES = {
    "flagship_result_string_faithful": _RESULT_STRING_FAITHFUL_SQL,
    "flagship_faithful": _FAITHFUL_SQL,
    "flagship_global": _GLOBAL_SQL,
    "flagship_csv_faithful": _CSV_FAITHFUL_SQL,
    "flagship_result_string": _RESULT_STRING_SQL,
}
