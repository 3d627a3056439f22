"""Partitioning-invariance properties for the scale-path operators:
the same answer must come back no matter how the input is split
(SURVEY.md §5.2.4)."""

from __future__ import annotations

from pyspark.sql import functions as F

from durablefunctions_mapreduce_dotnet_spark.operators.skew import (
    salted_distinct_count,
)
from durablefunctions_mapreduce_dotnet_spark.sources.readers import read_table

from .conftest import SF_DIR


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_salted_distinct_matches_exact_under_any_partitioning(spark):
    e = read_table(spark, SF_DIR, "events")
    exact = _rows(
        e.groupBy("event_type").agg(F.count_distinct("user_id").alias("n_users"))
    )
    for parts in (1, 7, 32):
        got = _rows(
            salted_distinct_count(
                e.repartition(parts), ["event_type"], "user_id", alias="n_users"
            )
        )
        assert got == exact, f"parts={parts}"


def test_salted_distinct_bucket_count_irrelevant(spark):
    e = read_table(spark, SF_DIR, "events")
    base = _rows(salted_distinct_count(e, ["event_type"], "user_id", buckets=2))
    for buckets in (1, 8, 101):
        assert (
            _rows(salted_distinct_count(e, ["event_type"], "user_id", buckets=buckets))
            == base
        ), f"buckets={buckets}"


def test_udaf_weighted_avg_partition_invariant(spark):
    """The grouped-agg pandas UDF sums int64 cents, so shuffling the
    row order inside each group batch must not move a single bit."""
    from durablefunctions_mapreduce_dotnet_spark.queries.udf_q import (
        _wavg_price,
        q_udaf_weighted_avg,
    )

    base = _rows(q_udaf_weighted_avg(spark, SF_DIR))
    li = read_table(spark, SF_DIR, "lineitem").repartition(13, "l_partkey")
    shuffled = _rows(
        li.groupBy("l_returnflag")
        .agg(_wavg_price("l_extendedprice", "l_quantity").alias("wavg_price"))
        .orderBy("l_returnflag")
    )
    assert shuffled == base


def test_bucketed_join_is_shuffle_free(spark):
    """Co-located join: both sides bucketed+sorted on the join key must
    sort-merge-join with ZERO exchanges — the 100 TB recipe for a
    repeatedly-joined fact/dim pair.  (Managed tables land in the local
    spark-warehouse; dropped after.)"""
    from durablefunctions_mapreduce_dotnet_spark.plans import explain_str

    li = read_table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_extendedprice")
    o = read_table(spark, SF_DIR, "orders").select("o_orderkey", "o_totalprice")
    try:
        (
            li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
            .mode("overwrite").saveAsTable("li_bucketed")
        )
        (
            o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
            .mode("overwrite").saveAsTable("o_bucketed")
        )
        j = (
            spark.table("li_bucketed")
            .hint("merge")  # keep SMJ even under the broadcast threshold
            .join(
                spark.table("o_bucketed"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
        )
        plan = explain_str(j, "simple")
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, plan
        # and it still computes the right thing
        assert j.count() == li.join(o, li.l_orderkey == o.o_orderkey).count()
    finally:
        spark.sql("DROP TABLE IF EXISTS li_bucketed")
        spark.sql("DROP TABLE IF EXISTS o_bucketed")


def test_time_rollup_open_close_tie_stable(spark):
    """Struct-extrema open/close must be identical under repartition —
    bare first()/min_by would not be."""
    from durablefunctions_mapreduce_dotnet_spark.queries.timeseries_q import (
        q_time_rollup_ohlc,
    )

    base = _rows(q_time_rollup_ohlc(spark, SF_DIR))
    # second run over a differently-split source
    e = read_table(spark, SF_DIR, "events").repartition(17)
    first = F.min(F.struct("ts", "event_id", "value"))
    last = F.max(F.struct("ts", "event_id", "value"))
    got = _rows(
        e.groupBy(
            F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(38,6)")).cast("double").alias("volume"),
            F.min("value").alias("low"),
            F.max("value").alias("high"),
            first["value"].alias("open_v"),
            last["value"].alias("close_v"),
        )
        .orderBy("day", "event_type")
    )
    assert got == base
