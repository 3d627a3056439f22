"""Parquet readers for the synthetic test tables (TESTDATA.md).

The reference's only source is a prefix-filtered blob listing + CSV
scan (``Sample.cs:109-126`` listing, ``Sample.cs:143-151`` scan).  In
Spark both collapse into ``spark.read`` over a path glob: file
enumeration is the InMemoryFileIndex, and the scan is the columnar
parquet/CSV datasource with predicate pushdown and column pruning —
so a "table" here is simply a path.

Remote stores (the ``Sample.cs:143`` HTTP-blob-stream analogue): every
path here is scheme-passthrough — ``sf_dir`` may be any Hadoop
filesystem URI (``file://``, ``hdfs://``, ``s3a://``, ``wasbs://``,
``abfss://``, ``gs://``) and reaches ``spark.read`` unmangled
(test: tests/test_sinks_stateful.py).  Azure blob containers, the
reference's actual store, mount via the hadoop-azure connector::

    spark.conf.set("fs.azure.account.key.<acct>.blob.core.windows.net", key)
    read_table(spark, "wasbs://<container>@<acct>.blob.core.windows.net/sf1", "events")

No driver-side byte streaming: executors range-request blocks in
parallel, which strictly dominates the reference's one-HTTP-stream-
per-mapper model (BASELINE.md measured ~1 MB/s/mapper).
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    """URI-safe join: preserves any filesystem scheme/authority verbatim
    (never os.path-normalizes, which would mangle ``scheme://``)."""
    return f"{sf_dir.rstrip('/')}/{name}.parquet"


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one synthetic table. Plain ``spark.read.parquet`` so Catalyst
    keeps pushdown/pruning; no caching or materialization here.

    ``events.ts`` is physically TIMESTAMP(NANOS); with
    ``spark.sql.legacy.parquet.nanosAsLong`` it surfaces as a long that we
    rebuild into a microsecond timestamp (``x div 1000`` in integer space —
    going through double would lose precision above 2^53 ns).
    """
    df = spark.read.parquet(table_path(sf_dir, name))
    # Scoped to the ONE table/column the nanos quirk applies to: a
    # generic "any long column named ts is nanos" heuristic would
    # silently divide epoch-micros or epoch-seconds columns by 1000.
    if name == "events":
        for field in df.schema.fields:
            if field.name == "ts" and field.dataType.typeName() == "long":
                df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return df


def read_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return {n: read_table(spark, sf_dir, n) for n in (names or TABLES)}


def read_binary_files(
    spark: SparkSession, glob: str, path_filter: str | None = None
) -> DataFrame:
    """Opaque-blob source for multimodal ingestion: one row per file with
    ``(path, modificationTime, length, content binary)`` — the input
    shape of the operators.multimodal decode pipeline when real media
    lands on a store.  Spark's binaryFile datasource lists in parallel
    and never decodes; pair with ``pathGlobFilter`` so listing (not
    reading) eliminates non-matching files."""
    r = spark.read.format("binaryFile")
    if path_filter:
        r = r.option("pathGlobFilter", path_filter)
    return r.load(glob)


TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def register_views(spark, sf_dir: str, prefix: str = "") -> None:
    """Register every corpus table as a temp view so users can drive the
    engine through plain ``spark.sql(...)`` — the SQL face of the
    DataFrame API (same scans, same Catalyst plans; a view is just a
    named logical plan, so predicate pushdown / pruning work
    identically).  ``prefix`` namespaces the views when a session hosts
    several scale factors at once."""
    for t in TABLES:
        read_table(spark, sf_dir, t).createOrReplaceTempView(f"{prefix}{t}")


def read_parquet_evolved(spark, base_dir: str):
    """Read a directory tree of parquet SNAPSHOTS whose schemas evolved
    over time (a crawl that gained columns across generations) as ONE
    frame: ``mergeSchema`` unions the footer schemas at planning time
    and older files surface the newer columns as NULL.  Pushdown and
    column pruning still reach each file with ITS OWN physical schema —
    a filter on a late-added column prunes nothing from old files (the
    column is NULL there) but scans of early columns stay pruned, so the
    merged view costs no more than the per-snapshot reads.

    Use for ADDITIVE drift only: mergeSchema refuses files that
    disagree on a column's TYPE (int vs bigint) — that's what
    :func:`union_harmonized` is for."""
    return (
        spark.read.option("mergeSchema", "true")
        .option("recursiveFileLookup", "true")
        .parquet(base_dir)
    )


def union_harmonized(dfs):
    """Union frames whose schemas drifted INCOMPATIBLY (renames aside):
    missing columns NULL-fill (``unionByName(allowMissingColumns)``)
    and same-named columns that only differ in numeric width are cast
    UP to the widest type first (int → bigint, float → double) — the
    repair path when ``mergeSchema`` refuses a snapshot set.  Column
    order follows first appearance across the inputs."""
    from pyspark.sql import functions as F

    # keys are DataFrame.dtypes simpleString names; tens digit = family
    _WIDTH = {
        "tinyint": 1, "smallint": 2, "int": 3, "bigint": 4,
        "float": 11, "double": 12,
    }
    widest: dict[str, str] = {}
    order: list[str] = []
    for df in dfs:
        for name, typ in df.dtypes:
            if name not in widest:
                widest[name] = typ
                order.append(name)
            elif typ != widest[name]:
                a, b = _WIDTH.get(typ), _WIDTH.get(widest[name])
                if a is None or b is None or (a // 10) != (b // 10):
                    raise ValueError(
                        f"column {name!r}: cannot harmonize {typ} with "
                        f"{widest[name]} (only numeric widening is safe)"
                    )
                if a > b:
                    widest[name] = typ
    out = None
    for df in dfs:
        have = dict(df.dtypes)
        cur = df.select(
            *[
                F.col(c).cast(widest[c]).alias(c)
                for c in order
                if c in have
            ]
        )
        out = cur if out is None else out.unionByName(
            cur, allowMissingColumns=True
        )
    return out.select(*order)
