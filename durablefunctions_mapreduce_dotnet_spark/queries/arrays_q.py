"""Array / lambda-function surface over the ``embeddings`` table.

The reference's only array use is ``double[7]`` aggregation state
(``Sample.cs:137,215`` — normalized to rows in our engine), so this
surface is Spark-first: higher-order functions (``size`` / ``filter`` /
``array_max`` / ``array_position``) and ``posexplode`` (UNNEST), all
JVM-side codegen — no Python in the loop.

Outputs are integer-exact (counts, positions, comparisons on identical
float32 values) so the DuckDB cross-check is bitwise, with no FP-sum
ordering concerns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.readers import read_table


def q_array_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector shape stats via higher-order functions: dimension,
    positive-component count, 1-based argmax position."""
    e = read_table(spark, sf_dir, "embeddings")
    emb = F.col("embedding")
    return e.select(
        "vec_id",
        F.size(emb).cast("long").alias("dim"),
        F.size(F.filter(emb, lambda x: x > 0)).cast("long").alias("n_pos"),
        F.array_position(emb, F.array_max(emb)).cast("long").alias("argmax_pos"),
    )


_ARRAY_STATS_SQL = """
SELECT vec_id,
       CAST(len(embedding) AS BIGINT) AS dim,
       CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_pos,
       CAST(list_position(embedding, list_max(embedding)) AS BIGINT) AS argmax_pos
FROM embeddings
"""


def q_array_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNNEST + re-aggregate: per class label, total components and
    non-negative components across all vectors (explode is the row
    generator Spark uses for flatten/unnest; counts stay exact)."""
    e = read_table(spark, sf_dir, "embeddings")
    return (
        e.select("label", F.explode("embedding").alias("x"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_components"),
            F.count(F.when(F.col("x") >= 0, 1)).alias("n_nonneg"),
        )
        .orderBy("label")
    )


_ARRAY_EXPLODE_SQL = """
SELECT label,
       COUNT(*) AS n_components,
       COUNT(CASE WHEN x >= 0 THEN 1 END) AS n_nonneg
FROM (SELECT label, UNNEST(embedding) AS x FROM embeddings)
GROUP BY label ORDER BY label
"""


QUERIES = {
    "array_stats": q_array_stats,
    "array_explode_agg": q_array_explode,
}
ORACLES = {
    "array_stats": _ARRAY_STATS_SQL,
    "array_explode_agg": _ARRAY_EXPLODE_SQL,
}
