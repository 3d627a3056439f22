#!/usr/bin/env python
"""Quiet interleaved A/B for graph_bfs_landmarks round structure
(VERDICT r14 #5): attack the per-round ``distinct`` + anti-join.

Shipped round (A):
    expanded.distinct() -> left_anti(visited)    [distinct exchange +
    visited-side exchange + anti-join stage]

Fused round (B): dedup and the visited-subtraction ride ONE
combiner-reduced aggregation:
    (expanded with flag 1) UNION (visited with flag 0)
      .groupBy(node, lm).agg(min(flag)) .where(flag = 1)
Same shuffle bytes (expanded + visited cross one exchange either way:
anti-join output partitioning reuse means A's left side doesn't
re-exchange), but one aggregation STAGE per round instead of a
distinct stage + an anti-join stage — fewer AQE replans, fewer
codegen spans, one fewer join.  Output provably identical: a
(node, lm) kept by B appeared in expanded and not visited == A's anti
semantics; the groupBy is the distinct.

Also times the adjacency build separately (phase attribution).
"""
from __future__ import annotations

import os
import sys
import time

repo = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, repo)

from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from durablefunctions_mapreduce_dotnet_spark.operators.graph import landmark_bfs
from durablefunctions_mapreduce_dotnet_spark.session import get_spark
from durablefunctions_mapreduce_dotnet_spark.sources.readers import read_table


def _edges(spark, sf_dir):
    li = read_table(spark, sf_dir, "lineitem")
    return li.select(
        F.col("l_suppkey").cast("long").alias("src"),
        (F.col("l_partkey") + 1_000_000).alias("dst"),
    )


def _lms(spark):
    return spark.createDataFrame([(1,), (2,), (3,), (4,)], "lm bigint")


def bfs_fused(edges, landmarks, max_depth=4):
    und = (
        edges.select(F.col("src").alias("u"), F.col("dst").alias("v"))
        .union(edges.select(F.col("dst").alias("u"), F.col("src").alias("v")))
        .distinct()
        .repartition("u")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    visited = landmarks.select(
        F.col("lm").alias("node"), F.col("lm").alias("lm"), F.lit(0).alias("dist")
    )
    frontier = visited
    for depth in range(1, max_depth + 1):
        expanded = (
            frontier.join(und, frontier.node == und.u)
            .select(F.col("v").alias("node"), "lm", F.lit(1).alias("_new"))
        )
        nxt = (
            expanded.union(
                visited.select("node", "lm", F.lit(0).alias("_new"))
            )
            .groupBy("node", "lm")
            .agg(F.min("_new").alias("_new"))
            .where(F.col("_new") == 1)
            .select("node", "lm")
            .withColumn("dist", F.lit(depth))
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        visited = visited.unionByName(nxt)
        frontier = nxt
    return visited


def wrap(d):
    return (
        d.groupBy("lm", "dist")
        .agg(F.count(F.lit(1)).alias("n_nodes"), F.sum("node").alias("sum_nodes"))
        .orderBy("lm", "dist")
    )


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("REPS", "4"))
    spark = get_spark("ab-bfs")
    from durablefunctions_mapreduce_dotnet_spark.queries import all_queries

    qs = all_queries()
    qs["flagship_faithful"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    spark.range(200_000).selectExpr(
        "aggregate(transform(sequence(0, 63), k -> (id + k) * 2654435761 % 2147483647),"
        " cast(0 as bigint), (acc, x) -> acc + x) AS s",
    ).write.format("noop").mode("overwrite").save()

    pa = wrap(landmark_bfs(_edges(spark, sf_dir), _lms(spark), max_depth=4)).toPandas()
    pb = wrap(bfs_fused(_edges(spark, sf_dir), _lms(spark), max_depth=4)).toPandas()
    assert pa.equals(pb), "fused variant output differs!"
    print(f"A == B ({len(pa)} rows)", flush=True)

    # phase attribution: adjacency build alone
    for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
        rdd.unpersist()
    e = _edges(spark, sf_dir)
    t0 = time.perf_counter()
    und = (
        e.select(F.col("src").alias("u"), F.col("dst").alias("v"))
        .union(e.select(F.col("dst").alias("u"), F.col("src").alias("v")))
        .distinct()
        .repartition("u")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    und.write.format("noop").mode("overwrite").save()
    print(f"adjacency build+materialize: {time.perf_counter() - t0:.3f}", flush=True)

    ta, tb = [], []
    for rep in range(reps):
        for tag, fn, acc in (
            ("A", lambda: wrap(landmark_bfs(_edges(spark, sf_dir), _lms(spark), max_depth=4)), ta),
            ("B", lambda: wrap(bfs_fused(_edges(spark, sf_dir), _lms(spark), max_depth=4)), tb),
        ):
            for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
                rdd.unpersist()
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            acc.append(dt)
            print(f"rep{rep} {tag}: {dt:.3f}", flush=True)
    print(
        f"bfs: A min={min(ta):.3f}  B min={min(tb):.3f}"
        f"  (A {[round(t, 2) for t in ta]}, B {[round(t, 2) for t in tb]})",
        flush=True,
    )


if __name__ == "__main__":
    main()
