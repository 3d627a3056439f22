import os, sys, time
sys.path.insert(0, "/root/repo")
from durablefunctions_mapreduce_dotnet_spark.session import get_spark
from durablefunctions_mapreduce_dotnet_spark.streaming.stream_ops import _stream_events, run_to_memory
from durablefunctions_mapreduce_dotnet_spark.streaming.stateful import ewma_daily_stateful

sf_dir = "/root/testdata/sf0.1"
spark = get_spark("probe-ewma")
from durablefunctions_mapreduce_dotnet_spark.queries import all_queries
qs = all_queries()
qs["flagship_faithful"](spark, sf_dir).write.format("noop").mode("overwrite").save()
import pandas as pd
from pyspark.sql.functions import col, pandas_udf
def _noop(s): return s
_noop.__annotations__ = {"s": pd.Series, "return": pd.Series}
spark.range(1000).select(pandas_udf("bigint")(_noop)(col("id"))).write.format("noop").mode("overwrite").save()

for rep in range(3):
    t0 = time.perf_counter()
    src = _stream_events(spark, sf_dir)
    t1 = time.perf_counter()
    agg = ewma_daily_stateful(src)
    t2 = time.perf_counter()
    out = run_to_memory(agg, "update")
    t3 = time.perf_counter()
    out.orderBy("event_type", "day").write.format("noop").mode("overwrite").save()
    t4 = time.perf_counter()
    print(f"rep{rep}: schema_probe={t1-t0:.3f} build={t2-t1:.3f} stream_drain={t3-t2:.3f} final_sort={t4-t3:.3f} total={t4-t0:.3f}", flush=True)
print("shuffle.partitions =", spark.conf.get("spark.sql.shuffle.partitions"))
print("state providers conf:", spark.conf.get("spark.sql.streaming.stateStore.providerClass", "default"))
