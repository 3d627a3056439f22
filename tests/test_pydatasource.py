"""Custom Python Data Source: split planning, executor-side generation,
determinism under re-read, and source-swap with the flagship pipeline.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from durablefunctions_mapreduce_dotnet_spark.functions.taxi import (
    dotnet_dayofweek,
    finite,
    trip_speed_mph,
)
from durablefunctions_mapreduce_dotnet_spark.sources.pydatasource import register


def _read(spark, parts=6, rows=500):
    register(spark)
    return (
        spark.read.format("synthetic_trips")
        .option("partitions", parts)
        .option("rows_per_partition", rows)
        .load()
    )


def test_partition_planning_and_counts(spark):
    df = _read(spark, parts=6, rows=500)
    assert df.count() == 3000
    # one task per planned InputPartition — the connector owns its splits
    assert df.rdd.getNumPartitions() == 6
    assert df.columns == ["vendor_id", "pickup_ts", "dropoff_ts", "trip_distance", "file_id"]


def test_deterministic_re_read(spark):
    cols = ["file_id", "pickup_ts", "trip_distance"]
    a = _read(spark).orderBy(cols).collect()
    b = _read(spark).orderBy(cols).collect()
    assert a == b and len(a) == 3000


def test_flagship_pipeline_runs_on_custom_source(spark):
    """Source-swap: the reference computation (speed, .NET dow, finite
    filter, per-file average-of-averages) runs unchanged over the custom
    connector — the engine property the whole DataSource API exists for."""
    df = _read(spark, parts=4, rows=400)
    speed = trip_speed_mph("trip_distance", "pickup_ts", "dropoff_ts")
    rows = (
        df.where(F.col("trip_distance") > 0)
        .select("file_id", dotnet_dayofweek("pickup_ts").alias("dow"), speed.alias("speed"))
        .where(F.col("speed").isNotNull() & finite(F.col("speed")))
        .groupBy("file_id", "dow")
        .agg(F.avg("speed").alias("file_avg"))
        .groupBy("dow")
        .agg(F.avg("file_avg").alias("avg_speed"))
        .orderBy("dow")
        .collect()
    )
    assert [r.dow for r in rows] == list(range(7))
    assert all(r.avg_speed > 0 for r in rows)
