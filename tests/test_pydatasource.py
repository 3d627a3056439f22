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


def _drain_stream(spark, rows_per_batch=150, max_batches=3):
    import uuid

    register(spark)
    src = (
        spark.readStream.format("synthetic_trips")
        .option("rows_per_batch", rows_per_batch)
        .option("max_batches", max_batches)
        .load()
    )
    name = f"t_{uuid.uuid4().hex[:8]}"
    q = src.writeStream.format("memory").queryName(name).outputMode("append").start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    tbl = spark.table(name)
    out = spark.createDataFrame(tbl.collect(), tbl.schema)
    spark.catalog.dropTempView(name)
    return out


def test_streaming_connector_micro_batches(spark):
    """The same connector's STREAMING face: offset-tracked micro-batches
    (file_id = batch index), bounded so processAllAvailable terminates."""
    df = _drain_stream(spark)
    assert df.count() == 450
    per = {r.file_id: r["count"] for r in df.groupBy("file_id").count().collect()}
    assert per == {0: 150, 1: 150, 2: 150}


def test_streaming_connector_is_replay_deterministic(spark):
    """(batch, row) -> record is pure, so two independent runs produce
    byte-identical streams — the property checkpoint replay assumes."""
    cols = ["file_id", "pickup_ts", "trip_distance"]
    a = _drain_stream(spark).orderBy(cols).collect()
    b = _drain_stream(spark).orderBy(cols).collect()
    assert a == b and len(a) == 450
