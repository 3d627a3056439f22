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


def test_read_parquet_evolved_and_union_harmonized(spark, tmp_path):
    """Schema-evolution surfaces: mergeSchema fills late-added columns
    with NULL for old snapshots; union_harmonized repairs the drift
    mergeSchema refuses (numeric widening) and rejects unsafe drift."""
    import pytest

    from durablefunctions_mapreduce_dotnet_spark.sources.readers import (
        read_parquet_evolved,
        union_harmonized,
    )

    g0 = spark.createDataFrame([(1, "a"), (2, "b")], "id bigint, text string")
    g1 = spark.createDataFrame(
        [(3, "c", "en")], "id bigint, text string, lang string"
    )
    g0.write.parquet(str(tmp_path / "snap" / "g0"))
    g1.write.parquet(str(tmp_path / "snap" / "g1"))
    m = read_parquet_evolved(spark, str(tmp_path / "snap"))
    assert set(m.columns) == {"id", "text", "lang"}
    rows = {r.id: r for r in m.collect()}
    assert rows[1].lang is None and rows[3].lang == "en"

    # int-vs-bigint drift: mergeSchema refuses, union_harmonized widens
    a = spark.createDataFrame([(1, 10)], "id bigint, quality int")
    b = spark.createDataFrame([(2, 20)], "id bigint, quality bigint")
    u = union_harmonized([a, b])
    assert dict(u.dtypes)["quality"] == "bigint"
    assert sorted((r.id, r.quality) for r in u.collect()) == [(1, 10), (2, 20)]
    # missing columns NULL-fill, first-appearance column order kept
    c = spark.createDataFrame([(3,)], "id bigint")
    u2 = union_harmonized([a, c])
    assert u2.columns == ["id", "quality"]
    assert {r.id: r.quality for r in u2.collect()} == {1: 10, 3: None}
    # string-vs-int drift is NOT silently repaired
    d = spark.createDataFrame([(4, "high")], "id bigint, quality string")
    with pytest.raises(ValueError, match="cannot harmonize"):
        union_harmonized([a, d])
