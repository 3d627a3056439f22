"""Similarity-search queries over the ``embeddings`` table."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.similarity import brute_force_topk, ivf_topk, lsh_topk
from ..sources.readers import read_table


def _queries_subset(e: DataFrame) -> DataFrame:
    """Deterministic query set: every 50th vector."""
    return e.where(F.col("vec_id") % 50 == 0)


def q_ann_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-5 for each query vector (ids + rank only)."""
    e = read_table(spark, sf_dir, "embeddings")
    return brute_force_topk(e, _queries_subset(e), k=5)


_ANN_BRUTE_SQL = """
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v,
         sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))) AS nrm
  FROM embeddings
),
q AS (SELECT vec_id AS qid, v AS qv, nrm AS qn FROM e WHERE vec_id % 50 = 0),
scored AS (
  SELECT q.qid, e.vec_id AS vid,
         list_sum(list_transform(range(1, len(qv) + 1), i -> qv[i] * e.v[i]))
           / (qn * e.nrm) AS cos
  FROM q JOIN e ON q.qid != e.vec_id
)
SELECT qid AS query_id, vid AS neighbor_id,
       CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, vid) AS INTEGER) AS rank
FROM scored
QUALIFY rank <= 5
"""


def q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed approximate top-5 (rows-only: the bucketing depends
    on baked-in hyperplanes; recall vs brute force is pytest-checked)."""
    e = read_table(spark, sf_dir, "embeddings")
    return lsh_topk(e, _queries_subset(e), k=5)


def q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-5 (rows-only: cell boundaries depend on the
    deterministic seed centroids; recall vs brute force is pytest-checked)."""
    e = read_table(spark, sf_dir, "embeddings")
    return ivf_topk(e, _queries_subset(e), k=5)


QUERIES = {
    "ann_bruteforce_topk": q_ann_bruteforce,
    "ann_lsh_topk": q_ann_lsh,
    "ann_ivf_topk": q_ann_ivf,
}
ORACLES = {
    "ann_bruteforce_topk": _ANN_BRUTE_SQL,
}
