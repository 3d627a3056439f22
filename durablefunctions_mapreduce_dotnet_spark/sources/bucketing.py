"""Bucketed tables: pre-shuffled storage for exchange-free joins.

At 100 TB the most expensive part of a fact-fact join is shuffling both
sides on the key.  Bucketed writes pay that shuffle ONCE at ingest:
``bucketBy(n, key)`` hash-partitions rows into a fixed number of
buckets per output partition, records the layout in the catalog, and
every later equi-join or aggregation on the key reuses it — Catalyst
plans a SortMergeJoin with NO Exchange on the bucketed sides
(plan-asserted in tests/test_bucketing.py).

This is the Spark-native analogue of co-located joins / distribution
keys in MPP warehouses; the reference has no storage layout at all
(one-shot CSV scan), so this surface is pure §2.2 extension.

Rules that make bucketing actually work (encoded here so callers can't
get them wrong):

* both join sides bucketed with the SAME bucket count (or a multiple,
  with ``spark.sql.bucketing.coalesceBucketsInJoin.enabled``),
* ``sortBy`` the same key so the merge phase needs no extra sort,
* one shuffle before writing (``repartition(n, key)``) so each task
  writes one file per bucket instead of ``tasks x buckets`` tiny files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = 8,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed+sorted managed parquet table."""
    spark = df.sparkSession
    if mode == "overwrite":
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        # a crashed prior run can leave the managed location behind with
        # no catalog entry; saveAsTable then refuses the name.  Delete
        # via the Hadoop FileSystem API so remote warehouses (hdfs://,
        # s3a://, abfss://) work too, and resolve db-qualified names to
        # their real <warehouse>/<db>.db/<tbl> directory.
        loc = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
        db, _, tbl = table.lower().rpartition(".")
        stale = f"{loc.rstrip('/')}/{db + '.db/' if db else ''}{tbl}"
        jvm = spark._jvm
        hpath = jvm.org.apache.hadoop.fs.Path(stale)
        hpath.getFileSystem(spark._jsc.hadoopConfiguration()).delete(hpath, True)
    w = (
        df.repartition(n_buckets, key)
        .write.mode(mode)
        .format("parquet")
        .bucketBy(n_buckets, key)
    )
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Catalog read — the bucket spec only survives via the catalog;
    reading the files by path would silently drop the layout."""
    return spark.table(table)


def bucketed_equi_join(
    spark: SparkSession, left_table: str, right_table: str, key: str
) -> DataFrame:
    """Equi-join of two same-bucketed tables: sort-merge with zero
    Exchange — the co-located join."""
    return read_bucketed(spark, left_table).join(
        read_bucketed(spark, right_table), key
    )
