"""Source/sink format surface: ORC and XML (Spark 4 built-ins) round-trip
with exact contents, alongside the parquet/csv/json/text/binaryFile
formats the rest of the suite already exercises.  A user switching a
pipeline onto this engine gets every batch format Spark ships without a
connector jar.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from durablefunctions_mapreduce_dotnet_spark.sources.readers import read_table

from .conftest import SF_DIR


def _events_subset(spark):
    return (
        read_table(spark, SF_DIR, "events")
        .select("event_id", "user_id", "event_type", "value")
        .orderBy("event_id")
        .limit(200)
    )


def test_orc_roundtrip_exact(spark, tmp_path):
    src = _events_subset(spark)
    path = str(tmp_path / "events.orc")
    src.write.orc(path)
    back = spark.read.orc(path)
    assert back.schema == src.schema
    assert sorted(back.collect()) == sorted(src.collect())


def test_orc_predicate_pushdown_reaches_scan(spark, tmp_path):
    src = _events_subset(spark)
    path = str(tmp_path / "events.orc")
    src.write.orc(path)
    plan = (
        spark.read.orc(path)
        .where(F.col("user_id") == 7)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [" in plan and "user_id" in plan.split("PushedFilters")[1][:80]


def test_xml_roundtrip_exact(spark, tmp_path):
    src = _events_subset(spark).limit(50)
    path = str(tmp_path / "events.xml")
    src.write.format("xml").option("rowTag", "event").save(path)
    back = (
        spark.read.format("xml")
        .option("rowTag", "event")
        .schema(src.schema)
        .load(path)
    )
    assert sorted(back.collect()) == sorted(src.collect())


def test_from_xml_typed_extraction(spark):
    df = spark.createDataFrame(
        [
            (1, "<doc><title>alpha</title><n>3</n></doc>"),
            (2, "<doc><title>beta</title></doc>"),  # missing n -> NULL
        ],
        "id bigint, raw string",
    )
    out = {
        r.id: (r.title, r.n)
        for r in df.select(
            "id", F.from_xml("raw", "title STRING, n INT").alias("p")
        ).select("id", "p.title", "p.n").collect()
    }
    assert out == {1: ("alpha", 3), 2: ("beta", None)}
