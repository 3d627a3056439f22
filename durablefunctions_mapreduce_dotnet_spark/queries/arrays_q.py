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


def q_array_pairwise_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary higher-order functions on PAIRS of vectors (zip_with +
    exists + aggregate): consecutive-id embedding pairs compared by
    sign agreement — the 1-bit-quantized similarity a sign-SimHash uses.
    sign_diffs counts components whose signs disagree (zip_with →
    filter → size), dot_pos flags a positive float32-exact sequential
    dot product (aggregate left-fold — same fold order as the oracle's
    list_sum, so even the FP path is engine-exact), has_big flags any
    |x| > 2 on the left vector (exists).  All outputs integer/boolean."""
    e = read_table(spark, sf_dir, "embeddings")
    a = e.select(
        F.col("vec_id"), F.col("embedding").alias("va")
    )
    b = e.select(
        (F.col("vec_id") - 1).alias("vec_id"), F.col("embedding").alias("vb")
    )
    dot = F.aggregate(
        F.zip_with("va", "vb", lambda x, y: (x * y).cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return (
        a.join(b, "vec_id")
        .select(
            "vec_id",
            F.size(
                F.filter(
                    F.zip_with("va", "vb", lambda x, y: (x > 0) != (y > 0)),
                    lambda d: d,
                )
            )
            .cast("long")
            .alias("sign_diffs"),
            (dot > 0).alias("dot_pos"),
            F.exists("va", lambda x: F.abs(x) > 2.0).alias("has_big"),
        )
        .orderBy("vec_id")
    )


_ARRAY_PAIRWISE_SQL = """
WITH pairs AS (
  SELECT a.vec_id, a.embedding AS va, b.embedding AS vb
  FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1
)
SELECT vec_id,
       CAST(len(list_filter(list_transform(range(1, len(va) + 1),
                                            i -> (va[i] > 0) <> (vb[i] > 0)),
                            d -> d)) AS BIGINT) AS sign_diffs,
       list_sum(list_transform(range(1, len(va) + 1),
                               i -> CAST(va[i] * vb[i] AS DOUBLE))) > 0 AS dot_pos,
       len(list_filter(va, x -> abs(x) > 2.0)) > 0 AS has_big
FROM pairs ORDER BY vec_id
"""


QUERIES = {
    "array_stats": q_array_stats,
    "array_explode_agg": q_array_explode,
    "array_pairwise_hof": q_array_pairwise_hof,
}
ORACLES = {
    "array_stats": _ARRAY_STATS_SQL,
    "array_explode_agg": _ARRAY_EXPLODE_SQL,
    "array_pairwise_hof": _ARRAY_PAIRWISE_SQL,
}
