#!/usr/bin/env python
"""Per-query profiling harness for the r14 optimization round: times
query CONSTRUCTION (eager driver jobs: checkpoints, approxQuantile,
collects) separately from the noop ACTION, best-of-N, so the expensive
half of each query is identifiable.  Not part of the bench contract —
a measurement tool per the optimization guide §1.
"""
from __future__ import annotations

import os
import sys
import time

repo = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, repo)

from durablefunctions_mapreduce_dotnet_spark.queries import all_queries
from durablefunctions_mapreduce_dotnet_spark.session import get_spark


def run(names: list[str], reps: int = 3) -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("profile")
    qs = all_queries()
    # warmup: same as bench.py
    qs["flagship_faithful"](spark, sf_dir).write.format("noop").mode("overwrite").save()
    spark.range(200_000).selectExpr(
        "aggregate(transform(sequence(0, 63), k -> (id + k) * 2654435761 % 2147483647),"
        " cast(0 as bigint), (acc, x) -> acc + x) AS s",
        "array_min(transform(slice(sequence(0, 63), 2, 60), x -> xxhash64(x, id))) AS m",
    ).write.format("noop").mode("overwrite").save()
    try:
        import pandas as pd  # noqa: F401
        from pyspark.sql.functions import col, pandas_udf

        def _noop(s):
            return s

        _noop.__annotations__ = {"s": pd.Series, "return": pd.Series}
        spark.range(1000).select(pandas_udf("bigint")(_noop)(col("id"))).write.format(
            "noop"
        ).mode("overwrite").save()
    except Exception:
        pass

    for name in names:
        cons, act, tot = [], [], []
        for _ in range(reps):
            t0 = time.perf_counter()
            df = qs[name](spark, sf_dir)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            cons.append(t1 - t0)
            act.append(t2 - t1)
            tot.append(t2 - t0)
            for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
                rdd.unpersist()
        print(
            f"{name:35s} total={min(tot):6.2f}  construct={min(cons):6.2f}  "
            f"action={min(act):6.2f}  (all reps tot: {[round(t,2) for t in tot]})",
            flush=True,
        )


if __name__ == "__main__":
    run(sys.argv[1:] or ["curation_zorder_layout"], reps=int(os.environ.get("REPS", "3")))
