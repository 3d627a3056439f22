"""The flagship query: average speed per day-of-week, reference-faithful.

The reference (``Sample.cs``) computes, per weekday, the **unweighted
average of per-file averages**, where a file with no qualifying trips
on a weekday still contributes ``0.0`` to that day's numerator and
counts in the denominator (``Sample.cs:196-199, 226-233``).  That is NOT
the global average speed; both variants are exposed and a differential
test asserts they differ where they must.

Physical shape (the plan Catalyst builds, verified via ``.explain``):

    scan (pruned to 3-4 cols, filters pushed)
      → narrow project/filter (whole-stage codegen, one fused loop —
        the moral equivalent of the reference's single mapper pass,
        ``Sample.cs:148-193``)
      → partial HashAggregate on (file, dow)   [map-side combiner ≙ A1]
      → shuffle on (file, dow)                 [the only wide exchange ≙ X2]
      → final HashAggregate                    [≙ A2]
      → broadcast-join onto the (file × 0..6) scaffold for zero-fill
      → tiny final agg on dow (7 groups)       [≙ A3 reducer]

At 100 TB the only large shuffle is the partial→final agg, and the
combiner reduces it to |files|×7 rows.  The scaffold is metadata-sized
(distinct file list) and broadcast.  No collect() anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.taxi import dotnet_dayofweek, finite, trip_speed_mph

#: decimal scale for the speed sums — speeds are ratios, 9 fractional
#: digits keeps the per-row cast deterministic and far below boundary
#: ambiguity while the exact decimal sum stays order-independent.
SPEED_DECIMAL = "decimal(38,9)"


def avg_of_file_averages(records: DataFrame, files: DataFrame, value_col: str = "speed") -> DataFrame:
    """Core two-level aggregation with zero-fill densification.

    records: columns ``file``, ``dow`` (0..6), ``<value_col>`` — already
        validity-filtered.
    files: one column ``file`` — the *listing universe* (``Sample.cs:119``):
        every listed file counts in the denominator even if it
        contributes no qualifying rows.
    Returns: ``(dow int, avg_speed double)`` ordered by dow.
    """
    per_file = records.groupBy("file", "dow").agg(
        F.sum(F.col(value_col).cast(SPEED_DECIMAL)).cast("double").alias("s"),
        F.count(F.lit(1)).alias("c"),
    )
    # Densification scaffold: every (file, 0..6) pair.  groupBy emits no
    # row for an empty group, but the reference emits all 7 buckets per
    # file, empty ones as 0.0 (Sample.cs:196-199) — so zero-fill is
    # explicit.  The scaffold is tiny (|files|×7): broadcast it.
    scaffold = files.distinct().select(
        "file", F.explode(F.sequence(F.lit(0), F.lit(6))).alias("dow")
    )
    # The outer (preserved) scaffold side must stream; per_file is the
    # broadcast build side — post-agg it is |files|×7 rows no matter the
    # input size, so the densify join is shuffle-free at any scale.
    densified = scaffold.join(F.broadcast(per_file), ["file", "dow"], "left").select(
        "file", "dow", F.coalesce(F.col("s") / F.col("c"), F.lit(0.0)).alias("file_avg")
    )
    # Final fan-in (≙ the reducer, Sample.cs:208-240) — deterministic,
    # unlike the reference's racy Parallel.For (Sample.cs:218-224).
    return (
        densified.groupBy("dow")
        .agg(
            (
                F.sum(F.col("file_avg").cast(SPEED_DECIMAL)).cast("double")
                / F.count(F.lit(1))
            ).alias("avg_speed")
        )
        .orderBy("dow")
    )


def global_avg_by_dow(records: DataFrame, value_col: str = "speed") -> DataFrame:
    """Idiomatic variant: plain global average per weekday (one shuffle,
    7 groups) — the answer most users actually want."""
    return (
        records.groupBy("dow")
        .agg(
            (
                F.sum(F.col(value_col).cast(SPEED_DECIMAL)).cast("double")
                / F.count(F.lit(1))
            ).alias("avg_speed")
        )
        .orderBy("dow")
    )


def trips_records(trips: DataFrame) -> DataFrame:
    """Project/filter a trips DataFrame (from ``sources.trips``) into the
    (file, dow, speed) shape: filters F2 (distance>0) and F3 (finite
    speed), expressions E1 (speed) and E2 (.NET day-of-week)."""
    speed = trip_speed_mph("trip_distance", "tpep_pickup_datetime", "tpep_dropoff_datetime")
    return (
        trips.where(F.col("trip_distance") > 0)
        .select(
            "file",
            dotnet_dayofweek("tpep_pickup_datetime").alias("dow"),
            speed.alias("speed"),
        )
        .where(finite(F.col("speed")))
    )


def flagship_trips(trips: DataFrame, files: DataFrame | None = None) -> DataFrame:
    """Reference query end-to-end on a trips source.

    ``files`` is the S1 listing universe; pass
    ``sources.trips.list_csv_files`` so a file whose every row fails
    validity still contributes its 7 zero buckets to the denominator
    (``Sample.cs:119,196-199``).  The default — files seen in the
    already-validated rows — silently drops such files, which only
    matches the reference when every file has >= 1 valid row."""
    universe = files if files is not None else trips.select("file")
    return avg_of_file_averages(trips_records(trips), universe)


def flagship_events(events: DataFrame) -> DataFrame:
    """Flagship plan on the synthetic ``events`` table (FIXTURES.md §2):
    ``event_type`` plays the per-file grouping role, ``value`` plays the
    speed measure (filtered >0 and finite), ``ts`` supplies the weekday."""
    records = (
        events.where((F.col("value") > 0) & finite(F.col("value")))
        .select(
            F.col("event_type").alias("file"),
            dotnet_dayofweek("ts").alias("dow"),
            F.col("value").alias("speed"),
        )
    )
    return avg_of_file_averages(records, events.select(F.col("event_type").alias("file")))


def flagship_events_global(events: DataFrame) -> DataFrame:
    records = (
        events.where((F.col("value") > 0) & finite(F.col("value")))
        .select(dotnet_dayofweek("ts").alias("dow"), F.col("value").alias("speed"))
    )
    return global_avg_by_dow(records)
