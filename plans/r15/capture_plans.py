#!/usr/bin/env python
"""Dump .explain('formatted') for the named queries into
plans/r15/<query>_<suffix>.txt — the committed plan evidence for the
r15 optimization round (guide §1.1/§7.2).  Usage:

    python plans/r15/capture_plans.py before query1 query2 ...
"""
from __future__ import annotations

import os
import sys

repo = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, repo)

from durablefunctions_mapreduce_dotnet_spark.queries import all_queries
from durablefunctions_mapreduce_dotnet_spark.session import get_spark


def main() -> None:
    suffix, names = sys.argv[1], sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.dirname(os.path.abspath(__file__))
    spark = get_spark("capture-plans")
    qs = all_queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"{name}: {len(plan.splitlines())} lines -> {path}", flush=True)
        for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
            rdd.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
