#!/usr/bin/env python
"""Quiet interleaved A/B for curation_pipeline_end2end's cut discipline
(r15): construction profiled at 2.65 s of the 3.02 s total — the funnel
serializes ~5 eager jobs (base full-text cut, winners id-set cut, the
MinHash pipeline's sign + pairs cuts, losers id-set cut).

Variant B turns the two TINY id-set cuts (winners, losers) into
persists: both frames are broadcast-sized, each feeds 2+ consumers of
the final multi-union action, so the pagerank/triangles r15 finding
(persist shares the computation and removes a serialized job barrier)
may apply.  The full-text ``base`` cut and the MinHash-internal cuts
stay (r14-measured load-bearing).  Outputs asserted identical first.
"""
from __future__ import annotations

import os
import sys
import time

repo = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, repo)

from pyspark.sql import DataFrame, functions as F
from pyspark.storagelevel import StorageLevel

from durablefunctions_mapreduce_dotnet_spark.session import get_spark
from durablefunctions_mapreduce_dotnet_spark.sources.readers import read_table


def variant(spark, sf_dir, which):
    from durablefunctions_mapreduce_dotnet_spark.operators.curation import hash_bucket
    from durablefunctions_mapreduce_dotnet_spark.operators.dedup import (
        minhash_near_dup_pairs,
    )
    from durablefunctions_mapreduce_dotnet_spark.operators.textops import (
        normalize_text,
        quality_score,
    )

    if which == "A":
        from durablefunctions_mapreduce_dotnet_spark.queries.curation_q import (
            q_pipeline_end2end,
        )

        return q_pipeline_end2end(spark, sf_dir)

    def cut_small(df):
        return df.persist(StorageLevel.MEMORY_AND_DISK)

    d = read_table(spark, sf_dir, "documents")
    normed = normalize_text(d).select("doc_id", "text_norm")
    nonempty = normed.where(
        F.col("text_norm").isNotNull() & (F.col("text_norm") != "")
    )
    base = quality_score(
        nonempty, text_col="text_norm", keep=("text_norm",)
    ).localCheckpoint(eager=True)
    quality = base.where("passes_quality").select("doc_id", "text_norm")
    winners = cut_small(
        quality.groupBy(F.md5("text_norm").alias("_fp"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    exact = quality.join(winners, "doc_id", "semi")
    pairs = minhash_near_dup_pairs(exact, text_col="text_norm", threshold=0.6)
    losers = cut_small(pairs.select(F.col("id_b").alias("doc_id")).distinct())
    kept = exact.join(losers, "doc_id", "anti")
    b = hash_bucket("doc_id")
    split = kept.select(
        F.when(b < 90, "05_train").when(b < 95, "06_val").otherwise("07_test").alias("stage")
    )

    def cnt(df: DataFrame, stage: str) -> DataFrame:
        return df.agg(F.count(F.lit(1)).alias("n_docs")).select(
            F.lit(stage).alias("stage"), "n_docs"
        )

    return (
        cnt(d, "00_raw")
        .unionByName(cnt(base, "01_nonempty_norm"))
        .unionByName(cnt(quality, "02_quality_pass"))
        .unionByName(cnt(exact, "03_exact_unique"))
        .unionByName(cnt(kept, "04_near_unique"))
        .unionByName(split.groupBy("stage").agg(F.count(F.lit(1)).alias("n_docs")))
        .orderBy("stage")
    )


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("REPS", "4"))
    spark = get_spark("ab-pipeline")
    from durablefunctions_mapreduce_dotnet_spark.queries import all_queries

    qs = all_queries()
    qs["flagship_faithful"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    spark.range(200_000).selectExpr(
        "aggregate(transform(sequence(0, 63), k -> (id + k) * 2654435761 % 2147483647),"
        " cast(0 as bigint), (acc, x) -> acc + x) AS s",
    ).write.format("noop").mode("overwrite").save()
    import pandas as pd  # noqa: F401
    from pyspark.sql.functions import col, pandas_udf

    def _noop(s):
        return s

    _noop.__annotations__ = {"s": pd.Series, "return": pd.Series}
    spark.range(1000).select(pandas_udf("bigint")(_noop)(col("id"))).write.format(
        "noop"
    ).mode("overwrite").save()

    pa = variant(spark, sf_dir, "A").toPandas()
    pb = variant(spark, sf_dir, "B").toPandas()
    assert pa.equals(pb), "pipeline variant differs!"
    print(f"A == B ({len(pa)} rows)", flush=True)

    accs = {"A": [], "B": []}
    for rep in range(reps):
        for tag in ("A", "B"):
            for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
                rdd.unpersist()
            t0 = time.perf_counter()
            variant(spark, sf_dir, tag).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            accs[tag].append(dt)
            print(f"rep{rep} {tag}: {dt:.3f}", flush=True)
    for tag, a in accs.items():
        print(f"pipeline {tag}: min={min(a):.3f} all={[round(t, 2) for t in a]}", flush=True)


if __name__ == "__main__":
    main()
