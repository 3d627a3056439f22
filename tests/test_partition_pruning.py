"""Dynamic partition pruning over a hive-partitioned layout — the scan
behavior the 100 TB posture depends on: a fact table laid out by a join
key must be pruned at runtime by a selective dimension filter, not
scanned fully (SURVEY.md §7.2 phase 5)."""

from __future__ import annotations

from pyspark.sql import functions as F

from durablefunctions_mapreduce_dotnet_spark.sources.readers import read_table

from .conftest import SF_DIR


def test_dynamic_partition_pruning_kicks_in(spark, tmp_path):
    path = str(tmp_path / "events_by_type")
    read_table(spark, SF_DIR, "events").write.partitionBy("event_type").mode(
        "overwrite"
    ).parquet(path)
    fact = spark.read.parquet(path)
    dim = spark.createDataFrame(
        [("click", 1), ("view", 2), ("error", 3)], "event_type string, grp int"
    ).where(F.col("grp") == 1)
    joined = fact.join(dim, "event_type").groupBy("grp").count()
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:2000]
    # and the result only sees the one surviving partition
    rows = joined.collect()
    assert len(rows) == 1
    one_type = read_table(spark, SF_DIR, "events").where(
        F.col("event_type") == "click"
    ).count()
    assert rows[0]["count"] == one_type
