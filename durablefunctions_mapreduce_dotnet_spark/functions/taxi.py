"""Column expressions encoding the reference's taxi-trip semantics.

Every quirk is deliberate and cited; the golden tests lock them in.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dotnet_dayofweek(ts: Column | str) -> Column:
    """.NET ``DayOfWeek`` numbering: Sunday=0 … Saturday=6 (``Sample.cs:189``).

    Spark's ``dayofweek`` is Sunday=1 … Saturday=7, hence the ``- 1``.
    (DuckDB's ``dayofweek`` is already Sunday=0, so the oracle uses it bare.)
    """
    return (F.dayofweek(ts) - F.lit(1)).cast("int")


def trip_speed_mph(distance: Column | str, pickup: Column | str, dropoff: Column | str) -> Column:
    """``trip_distance / (dropoff - pickup).TotalHours`` (``Sample.cs:174``).

    Fractional-second fidelity: the .NET ``TotalHours`` is fractional, so
    the timestamp difference is taken at microsecond precision, not whole
    seconds.  Division by a zero interval yields ±Infinity (IEEE), never
    an error — matching the reference, whose DivideByZeroException catch
    (``Sample.cs:182-185``) is dead code.  Negative durations produce
    negative speeds and are NOT filtered (``Sample.cs:174-189``).
    """
    d = F.col(distance) if isinstance(distance, str) else distance
    pu = F.col(pickup) if isinstance(pickup, str) else pickup
    do = F.col(dropoff) if isinstance(dropoff, str) else dropoff
    hours = (do.cast("double") - pu.cast("double")) / F.lit(3600.0)
    # try_divide: zero-duration trips yield NULL instead of ANSI-mode
    # errors; filter F3 drops them just as the reference drops ±Infinity.
    return F.try_divide(d, hours)


def finite(c: Column) -> Column:
    """NOT isnan AND NOT isinf — filter F3 (``Sample.cs:176-186``)."""
    return (~F.isnan(c)) & (c != F.lit(float("inf"))) & (c != F.lit(float("-inf")))
