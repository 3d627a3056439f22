#!/usr/bin/env python
"""Quiet interleaved A/B for graph_pagerank round discipline (VERDICT
r14 #6): the r10 tuning (lazy localCheckpoint per round) predates the
r14 persist toolkit.  Each pagerank round's ``ranks`` feeds THREE
consumers (contribs join, dangling semi-agg, densify join), so a
persisted round shares one computation across the branches while the
lazy cut relies on the localCheckpoint block being materialized by
whichever branch runs first.

A = shipped (checkpoint=local_checkpoint, lazy cut per round).
B = persist(MEMORY_AND_DISK) per round, no lineage cut (plan grows
    ~2^iters with iters=3 — bounded, the kcore 3^rounds lesson does
    not apply at 2^3).
C = persist per round AND lazy cut every round (cut + shared blocks).

Equality asserted first; interleaved A,B,C reps; per-variant minima.
"""
from __future__ import annotations

import os
import sys
import time

repo = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, repo)

from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from durablefunctions_mapreduce_dotnet_spark.operators.graph import (
    local_checkpoint,
    pagerank,
)
from durablefunctions_mapreduce_dotnet_spark.session import get_spark
from durablefunctions_mapreduce_dotnet_spark.sources.readers import read_table


def _edges(spark, sf_dir):
    li = read_table(spark, sf_dir, "lineitem")
    return li.select(
        F.col("l_suppkey").cast("long").alias("src"),
        (F.col("l_partkey") + 1_000_000).alias("dst"),
    )


def _persist_cut(df):
    return df.persist(StorageLevel.MEMORY_AND_DISK)


def _persist_then_lazy(df):
    return local_checkpoint.lazy(df.persist(StorageLevel.MEMORY_AND_DISK))


_persist_cut.lazy = _persist_cut  # CheckpointFn.lazy protocol
_persist_then_lazy.lazy = _persist_then_lazy


def build(spark, sf_dir, variant):
    ck = {
        "A": local_checkpoint,
        "B": _persist_cut,
        "C": _persist_then_lazy,
    }[variant]
    return pagerank(_edges(spark, sf_dir), iters=3, checkpoint=ck).orderBy("node")


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("REPS", "4"))
    variants = list(os.environ.get("VARIANTS", "ABC"))
    spark = get_spark("ab-pagerank")
    from durablefunctions_mapreduce_dotnet_spark.queries import all_queries

    qs = all_queries()
    qs["flagship_faithful"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    spark.range(200_000).selectExpr(
        "aggregate(transform(sequence(0, 63), k -> (id + k) * 2654435761 % 2147483647),"
        " cast(0 as bigint), (acc, x) -> acc + x) AS s",
    ).write.format("noop").mode("overwrite").save()

    base = build(spark, sf_dir, "A").toPandas()
    for v in variants:
        if v == "A":
            continue
        other = build(spark, sf_dir, v).toPandas()
        assert base.equals(other), f"variant {v} output differs!"
    print(f"outputs identical across {variants} ({len(base)} rows)", flush=True)

    accs = {v: [] for v in variants}
    for rep in range(reps):
        for v in variants:
            for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
                rdd.unpersist()
            t0 = time.perf_counter()
            df = build(spark, sf_dir, v)
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            accs[v].append(dt)
            print(f"rep{rep} {v}: {dt:.3f}", flush=True)
    for v in variants:
        print(
            f"pagerank {v}: min={min(accs[v]):.3f}  all={[round(t, 2) for t in accs[v]]}",
            flush=True,
        )


if __name__ == "__main__":
    main()
