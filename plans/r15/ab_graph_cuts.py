#!/usr/bin/env python
"""Quiet interleaved A/B for the eager-cut graph operators (r15): the
pagerank round A/B showed persist-per-frame beating the eager
localCheckpoint when the pinned frame's consumers ride one action.
label_propagation (2.37 s construct of 3.20 total) and triangle_counts
(2.47 of 2.82) spend their time in eager cuts of edge-derived frames:

  label_propagation: und = EAGER cut of the canonical distinct edge
  list (feeds the two racing union legs of ``both``).
  triangle_counts: und AND oriented both EAGER-cut (3 consumers each).

Variants (equality asserted first, then interleaved best-of-N):
  lp_A   shipped (eager cut on und)
  lp_B   und persisted MEMORY_AND_DISK (loop rides one action; the
         union legs may duplicate the distinct per cached partition)
  tri_A  shipped (eager cuts on und + oriented)
  tri_B  both persisted
  tri_C  und persisted, oriented eager-cut (the wedge join's 3 racing
         legs keep the materialized frame; the cheap canonical distinct
         tolerates the race)
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
    label_propagation,
    local_checkpoint,
    triangle_counts,
)
from durablefunctions_mapreduce_dotnet_spark.session import get_spark


def _persist_cut(df):
    return df.persist(StorageLevel.MEMORY_AND_DISK)


_persist_cut.lazy = _persist_cut


def _lp_edges(spark, sf_dir):
    # mirror the benched query's edge derivation (the affinity self-join)
    from durablefunctions_mapreduce_dotnet_spark.queries.graph_q import (
        _affinity_pairs,
    )

    return _affinity_pairs(spark, sf_dir)


_tri_edges = _lp_edges


def lp(spark, sf_dir, variant):
    ck = local_checkpoint if variant == "A" else _persist_cut
    return label_propagation(_lp_edges(spark, sf_dir), iters=4, checkpoint=ck).orderBy(
        "node"
    )


def tri(spark, sf_dir, variant):
    if variant == "A":
        out = triangle_counts(_tri_edges(spark, sf_dir), checkpoint=local_checkpoint)
    elif variant == "B":
        out = triangle_counts(_tri_edges(spark, sf_dir), checkpoint=_persist_cut)
    else:  # C: und persisted, oriented eager — needs the split checkpoint
        calls = {"n": 0}

        def split_ck(df):
            calls["n"] += 1
            return _persist_cut(df) if calls["n"] == 1 else local_checkpoint(df)

        split_ck.lazy = split_ck
        out = triangle_counts(_tri_edges(spark, sf_dir), checkpoint=split_ck)
    return out.orderBy("n")


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("REPS", "4"))
    which = os.environ.get("WHICH", "lp,tri").split(",")
    spark = get_spark("ab-graph-cuts")
    from durablefunctions_mapreduce_dotnet_spark.queries import all_queries

    qs = all_queries()
    qs["flagship_faithful"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    spark.range(200_000).selectExpr(
        "aggregate(transform(sequence(0, 63), k -> (id + k) * 2654435761 % 2147483647),"
        " cast(0 as bigint), (acc, x) -> acc + x) AS s",
    ).write.format("noop").mode("overwrite").save()

    plans_ = {"lp": (lp, ["A", "B"]), "tri": (tri, ["A", "B", "C"])}
    for name in which:
        fn, variants = plans_[name]
        base = fn(spark, sf_dir, variants[0]).toPandas()
        for v in variants[1:]:
            other = fn(spark, sf_dir, v).toPandas()
            assert base.equals(other), f"{name} variant {v} output differs!"
        print(f"{name}: outputs identical across {variants} ({len(base)} rows)", flush=True)
        accs = {v: [] for v in variants}
        for rep in range(reps):
            for v in variants:
                for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
                    rdd.unpersist()
                t0 = time.perf_counter()
                fn(spark, sf_dir, v).write.format("noop").mode("overwrite").save()
                dt = time.perf_counter() - t0
                accs[v].append(dt)
                print(f"rep{rep} {name}_{v}: {dt:.3f}", flush=True)
        for v in variants:
            print(
                f"{name} {v}: min={min(accs[v]):.3f} all={[round(t, 2) for t in accs[v]]}",
                flush=True,
            )


if __name__ == "__main__":
    main()
