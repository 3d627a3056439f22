"""Bucketed-table co-located joins + binaryFile source (§2.2 storage
layout extensions, round 2)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from durablefunctions_mapreduce_dotnet_spark.plans import explain_str
from durablefunctions_mapreduce_dotnet_spark.sources.bucketing import (
    bucketed_equi_join,
    write_bucketed,
)
from durablefunctions_mapreduce_dotnet_spark.sources.readers import (
    read_binary_files,
    read_table,
)

from .conftest import SF_DIR


def test_bucketed_join_has_no_exchange(spark):
    o = read_table(spark, SF_DIR, "orders").select("o_custkey", "o_totalprice")
    c = read_table(spark, SF_DIR, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_acctbal"
    )
    write_bucketed(o, "b_orders", "o_custkey", n_buckets=4)
    write_bucketed(c, "b_customer", "o_custkey", n_buckets=4)
    # force the large-table regime bucketing exists for: with broadcast
    # available Catalyst rightly prefers BHJ and ignores the bucket
    # layout (small side fits in memory — bucketing buys nothing there)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_equi_join(spark, "b_orders", "b_customer", "o_custkey")
        plan = explain_str(joined, "simple")
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"
        # and it computes the same rows as the plain join
        plain = o.join(c, "o_custkey").count()
        assert joined.count() == plain
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_groupby_skips_exchange(spark):
    o = read_table(spark, SF_DIR, "orders").select("o_custkey", "o_totalprice")
    write_bucketed(o, "b_orders_agg", "o_custkey", n_buckets=4)
    agg = (
        spark.table("b_orders_agg")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert "Exchange" not in explain_str(agg, "simple")


def test_binary_file_source_reads_fixture_blobs(spark):
    fixture_dir = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "fixtures", "trips"
    )
    blobs = read_binary_files(spark, fixture_dir, path_filter="*.csv")
    rows = blobs.select("path", "length", F.length("content").alias("n")).collect()
    assert len(rows) == 3
    for r in rows:
        assert r["length"] == r["n"] > 0
        assert r["path"].endswith(".csv")
