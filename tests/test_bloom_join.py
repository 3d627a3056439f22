"""Bloom-prefilter join (operators.joins.bloom_filter_build /
bloom_might_contain): the properties the oracle row cannot see —
no false negatives ever, real probe-side reduction, and a driver
collect bounded by the filter size (not the build side)."""

from __future__ import annotations

from pyspark.sql import functions as F

from durablefunctions_mapreduce_dotnet_spark.operators.joins import (
    bloom_filter_build,
    bloom_might_contain,
)
from durablefunctions_mapreduce_dotnet_spark.sources.readers import read_table

from .conftest import SF_DIR


def test_bloom_has_no_false_negatives(spark):
    """Every probe row whose key exists on the build side MUST pass the
    filter — a false negative silently drops join rows, which is the
    one failure mode the exact-join oracle can't catch (it would catch
    it, but as a red row; this pins the cause)."""
    o = read_table(spark, SF_DIR, "orders").where(
        F.col("o_orderpriority") == "1-URGENT"
    )
    li = read_table(spark, SF_DIR, "lineitem")
    words = bloom_filter_build(o.select("o_orderkey"), "o_orderkey")
    true_match = li.join(
        o.select("o_orderkey"), li.l_orderkey == F.col("o_orderkey")
    ).select("l_orderkey", "l_linenumber")
    missed = true_match.join(
        li.where(bloom_might_contain(words, "l_orderkey")).select(
            "l_orderkey", "l_linenumber"
        ),
        ["l_orderkey", "l_linenumber"],
        "left_anti",
    )
    assert missed.count() == 0


def test_bloom_reduces_probe_side(spark):
    """~20% of orders are urgent, so the prefiltered lineitem should be
    well under half the table (20% true + small FPP at 2^18 bits)."""
    o = read_table(spark, SF_DIR, "orders").where(
        F.col("o_orderpriority") == "1-URGENT"
    )
    li = read_table(spark, SF_DIR, "lineitem")
    words = bloom_filter_build(o.select("o_orderkey"), "o_orderkey")
    total = li.count()
    kept = li.where(bloom_might_contain(words, "l_orderkey")).count()
    true = li.join(o.select("o_orderkey"), li.l_orderkey == F.col("o_orderkey")).count()
    assert kept < 0.5 * total, f"kept {kept}/{total}: filter not selective"
    # every true match passes (orderkey is unique on the build side, so
    # join rows == matching probe rows): kept is true matches + FPs
    assert kept >= true


def test_bloom_word_count_bounded(spark):
    """The driver-side state is <= m/64 words regardless of build rows."""
    o = read_table(spark, SF_DIR, "orders")
    words = bloom_filter_build(o.select("o_orderkey"), "o_orderkey", log2_m=12)
    assert len(words) == (1 << 12) // 64
    # and the filter is actually populated
    assert sum(1 for w in words if w != 0) > 0
