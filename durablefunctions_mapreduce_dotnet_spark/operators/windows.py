"""Window-function operators: sessionization and friends.

Absent from the reference (SURVEY.md §2.2); built on Spark's native
window exec.  Every ordered window here uses a total order (ts +
unique id tie-break) so results are deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    id_col: str = "event_id",
) -> DataFrame:
    """Assign gap-based session ids per user: a new session starts when
    the time since the previous event exceeds ``gap_seconds``.

    lag + cumulative sum over one window — a single shuffle on the user
    key, linear per-user work.  Gap arithmetic is done in integer
    microseconds (``unix_micros``) so it is exact.  ``id_col`` breaks
    timestamp ties so per-row session ids are deterministic (a total
    order, not just ts order).
    """
    order = [ts_col] + ([id_col] if id_col in events.columns else [])
    w = Window.partitionBy(user_col).orderBy(*order)
    gap_us = F.lit(gap_seconds * 1_000_000)
    prev = F.lag(F.unix_micros(F.col(ts_col))).over(w)
    is_new = F.when(
        prev.isNull() | ((F.unix_micros(F.col(ts_col)) - prev) > gap_us), 1
    ).otherwise(0)
    return events.withColumn(
        "session_id",
        F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
