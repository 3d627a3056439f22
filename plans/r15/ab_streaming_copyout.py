import sys, time, uuid
sys.path.insert(0, "/root/repo")
from durablefunctions_mapreduce_dotnet_spark.session import get_spark
from durablefunctions_mapreduce_dotnet_spark.streaming.stream_ops import _stream_events
from durablefunctions_mapreduce_dotnet_spark.streaming.stateful import ewma_daily_stateful

sf_dir = "/root/testdata/sf0.1"
spark = get_spark("probe-ewma2")
from durablefunctions_mapreduce_dotnet_spark.queries import all_queries
qs = all_queries()
qs["flagship_faithful"](spark, sf_dir).write.format("noop").mode("overwrite").save()

def drain(copy):
    name = f"stream_{uuid.uuid4().hex[:12]}"
    agg = ewma_daily_stateful(_stream_events(spark, sf_dir))
    q = agg.writeStream.format("memory").queryName(name).outputMode("update").start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    tbl = spark.table(name)
    if copy == "rows":
        out = spark.createDataFrame(tbl.collect(), tbl.schema)
    elif copy == "lck":
        out = tbl.localCheckpoint(eager=True)
    spark.catalog.dropTempView(name)
    return out

# equality check
pa = drain("rows").orderBy("event_type", "day").toPandas()
pb = drain("lck").orderBy("event_type", "day").toPandas()
assert pa.equals(pb), "copy variants differ!"
print(f"rows == lck ({len(pa)} rows)", flush=True)

import time
accs = {"rows": [], "lck": []}
for rep in range(4):
    for tag in ("rows", "lck"):
        t0 = time.perf_counter()
        out = drain(tag)
        out.orderBy("event_type", "day").write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        accs[tag].append(dt)
        print(f"rep{rep} {tag}: {dt:.3f}", flush=True)
for tag, a in accs.items():
    print(f"{tag}: min={min(a):.3f} all={[round(t,2) for t in a]}", flush=True)
