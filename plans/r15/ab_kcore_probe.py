#!/usr/bin/env python
"""Quiet interleaved A/B for kcore's convergence probe (r15): the peel
runs to FIXPOINT with one eager count probe per round — the probe is
what materializes each round's lazy cut, so the loop pays one
serialized driver job per round.  Variant B probes every 2nd round:
edge counts strictly decrease until the fixpoint, so equality across a
2-round window ⟺ both rounds peeled nothing ⟺ fixpoint — the returned
core is the SAME unique subgraph (extra no-op rounds change nothing),
at half the probe jobs plus at most one wasted no-op round of
semi-join work.  Plan growth between probes is 3^2 = 9 subtrees —
bounded, nowhere near the 3^rounds blow-up that OOMed the r14
persist-only variant.
"""
from __future__ import annotations

import os
import sys
import time

repo = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, repo)

from pyspark.sql import functions as F

from durablefunctions_mapreduce_dotnet_spark.operators.graph import (
    CheckpointFn,
    kcore,
    local_checkpoint,
)
from durablefunctions_mapreduce_dotnet_spark.session import get_spark


def kcore_stride(
    edges, k=3, src="id_a", dst="id_b", max_rounds=30, stride=2,
    checkpoint=local_checkpoint,
):
    cut_lazy = getattr(checkpoint, "lazy", checkpoint)
    one = cut_lazy(
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).where(
            F.col(src) != F.col(dst)
        )
    )
    bi = cut_lazy(one.union(one.select(F.col("v").alias("u"), F.col("u").alias("v"))))
    n_edges = bi.count()
    rounds_run = 0
    for r in range(max_rounds):
        if n_edges == 0:
            return bi.select(F.col("u").alias("node")).distinct().withColumn(
                "degree", F.lit(0).cast("bigint")
            ).where(F.lit(False))
        alive = bi.groupBy("u").agg(F.count(F.lit(1)).alias("_deg")).where(
            F.col("_deg") >= k
        ).select("u")
        bi = cut_lazy(
            bi.join(alive, "u", "left_semi").join(
                alive.select(F.col("u").alias("v")), "v", "left_semi"
            )
        )
        rounds_run += 1
        if (r + 1) % stride == 0 or r == max_rounds - 1:
            new_edges = bi.count()
            if new_edges == n_edges:
                print(f"  [stride] fixpoint after {rounds_run} rounds", flush=True)
                return (
                    bi.groupBy("u")
                    .agg(F.count(F.lit(1)).alias("degree"))
                    .select(F.col("u").alias("node"), "degree")
                )
            n_edges = new_edges
    raise RuntimeError("kcore_stride: no fixpoint")


def _edges(spark, sf_dir):
    from durablefunctions_mapreduce_dotnet_spark.queries.graph_q import (
        _affinity_pairs,
    )

    return _affinity_pairs(spark, sf_dir)


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("REPS", "4"))
    spark = get_spark("ab-kcore")
    from durablefunctions_mapreduce_dotnet_spark.queries import all_queries

    qs = all_queries()
    qs["flagship_faithful"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    wrap = lambda d: d.orderBy("node")
    pa = wrap(kcore(_edges(spark, sf_dir), k=3)).toPandas()
    pb = wrap(kcore_stride(_edges(spark, sf_dir), k=3, stride=2)).toPandas()
    assert pa.equals(pb), "stride variant output differs!"
    print(f"A == B ({len(pa)} rows)", flush=True)

    accs = {"A": [], "B": []}
    for rep in range(reps):
        for tag, fn in (
            ("A", lambda: wrap(kcore(_edges(spark, sf_dir), k=3))),
            ("B", lambda: wrap(kcore_stride(_edges(spark, sf_dir), k=3, stride=2))),
        ):
            for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
                rdd.unpersist()
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            accs[tag].append(dt)
            print(f"rep{rep} {tag}: {dt:.3f}", flush=True)
    for tag, a in accs.items():
        print(f"kcore {tag}: min={min(a):.3f} all={[round(t, 2) for t in a]}", flush=True)


if __name__ == "__main__":
    main()
