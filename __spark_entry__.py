"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query on sf0.001; every
``queries()[name]`` is cross-checked at sf0.01 against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash).  Implementation lives in ``durablefunctions_mapreduce_dotnet_spark/``;
this file is only wiring.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from durablefunctions_mapreduce_dotnet_spark.queries import all_oracles, all_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (SURVEY.md §2.1) on /root/testdata/sf0.001."""
    return all_queries()["flagship_faithful"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return all_queries()


def oracle_sql() -> dict[str, str]:
    return all_oracles()
