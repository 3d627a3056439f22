"""Similarity search over embedding columns (north-star scope).

Two paths:
* brute-force cosine top-k — the exactness baseline: broadcast the query
  set, one pass over the corpus, per-query heap via window top-k.
* random-hyperplane LSH — the scale path: bucket both sides by sign
  signature, search only within buckets (multi-probe across plane
  subsets raises recall).

All vector math is Catalyst higher-order functions (functions.vectors);
no Python in the hot path.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vectors import as_double, cosine, l2_norm


def _prep(embeddings: DataFrame, vec_col: str, id_col: str) -> DataFrame:
    return embeddings.select(
        F.col(id_col).alias("vid"), as_double(vec_col).alias("v")
    ).withColumn("nrm", l2_norm(F.col("v")))


def brute_force_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact cosine top-k for each query vector.

    queries: subset of ``embeddings`` (same schema).  The query side is
    broadcast, so the corpus never shuffles: each corpus partition scores
    |Q| dot products per row, and only (query, corpus-row, cosine)
    tuples reach the per-query top-k window.  At 100 TB with a large
    query set, switch to ``applyInPandas`` block matrix multiply per
    partition; the plan shape (broadcast + local scoring + windowed
    top-k) stays the same.
    """
    e = _prep(embeddings, vec_col, id_col)
    q = _prep(queries, vec_col, id_col).select(
        F.col("vid").alias("qid"), F.col("v").alias("qv"), F.col("nrm").alias("qn")
    )
    scored = (
        F.broadcast(q)
        .join(e, F.col("qid") != F.col("vid"))
        .select(
            "qid",
            "vid",
            cosine(F.col("qv"), F.col("v"), F.col("qn"), F.col("nrm")).alias("cos"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("vid"))
    return (
        scored.select(
            F.col("qid").alias("query_id"),
            F.col("vid").alias("neighbor_id"),
            F.row_number().over(w).alias("rank"),
        )
        .where(F.col("rank") <= k)
    )


def hyperplane_signature(v: Column, planes: list[list[float]]) -> Column:
    """Bucket id from sign bits of dot(v, plane_i) — pure expressions."""
    bits = [
        F.when(
            F.aggregate(
                F.zip_with(v, F.array(*[F.lit(x) for x in p]), lambda a, b: a * b),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            > 0,
            F.lit(1 << i),
        ).otherwise(F.lit(0))
        for i, p in enumerate(planes)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("int")


def make_planes(dim: int, num_planes: int = 8, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-Gaussian hyperplanes (sum of uniforms), no
    numpy dependency in the plan — planes are baked in as literals."""
    rng = random.Random(seed)
    return [
        [sum(rng.uniform(-1, 1) for _ in range(6)) for _ in range(dim)]
        for _ in range(num_planes)
    ]


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_lists: int = 16,
    n_probe: int = 4,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k — the second scale path
    beside LSH.

    Coarse quantizer: the ``n_lists`` lowest-id vectors serve as
    deterministic seed centroids (production would refine with
    k-means|| — the plan shape is identical, only centroid quality
    changes).  Every corpus vector lands in its max-cosine cell; each
    query probes its ``n_probe`` nearest cells and scores only those
    inverted lists: O(|Q|·N·n_probe/n_lists) exact scoring instead of
    O(|Q|·N), and the cell assignment is an equi-join key, so candidate
    generation is a broadcast hash join — no all-pairs anywhere.
    Recall is pytest-checked against brute force."""
    e = _prep(embeddings, vec_col, id_col)
    w_id = Window.orderBy("vid")
    cents = (
        e.withColumn("_r", F.row_number().over(w_id))
        .where(F.col("_r") <= n_lists)
        .select(
            (F.col("_r") - 1).alias("cell"),
            F.col("v").alias("cv"),
            F.col("nrm").alias("cn"),
        )
    )
    cos_to_cent = cosine(F.col("v"), F.col("cv"), F.col("nrm"), F.col("cn"))

    def assign(side: DataFrame, keep: int) -> DataFrame:
        w = Window.partitionBy("vid").orderBy(F.desc("_cc"), F.asc("cell"))
        return (
            side.crossJoin(F.broadcast(cents))
            .select("vid", "v", "nrm", "cell", cos_to_cent.alias("_cc"))
            .withColumn("_cr", F.row_number().over(w))
            .where(F.col("_cr") <= keep)
            .drop("_cc", "_cr")
        )

    lists = assign(e, 1)
    probes = assign(_prep(queries, vec_col, id_col), n_probe).select(
        F.col("vid").alias("qid"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
        "cell",
    )
    scored = (
        F.broadcast(probes)
        .join(lists, "cell")
        .where(F.col("qid") != F.col("vid"))
        .select(
            "qid",
            "vid",
            cosine(F.col("qv"), F.col("v"), F.col("qn"), F.col("nrm")).alias("cos"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("vid"))
    return (
        scored.select(
            F.col("qid").alias("query_id"),
            F.col("vid").alias("neighbor_id"),
            F.row_number().over(w).alias("rank"),
        )
        .where(F.col("rank") <= k)
    )


def lsh_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = 64,
    num_tables: int = 4,
    planes_per_table: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: multi-table random-hyperplane LSH.

    Each of L tables hashes vectors into 2^p sign-buckets; candidates
    are the union over tables of same-bucket pairs (deduped), scored
    exactly, then windowed top-k.  Recall for a neighbor at cosine c is
    1-(1-(1-acos(c)/π)^p)^L — tune (p, L) to the corpus: more planes →
    cheaper scoring, more tables → higher recall.  The join is a plain
    equi-join on (table, bucket): O(|Q|·|C|/2^p·L) instead of O(|Q|·|C|).
    """
    tables = [
        make_planes(dim, planes_per_table, seed + 1000 * t) for t in range(num_tables)
    ]

    def buckets(v: Column) -> Column:
        return F.array(
            *[
                F.struct(F.lit(t).alias("t"), hyperplane_signature(v, planes).alias("b"))
                for t, planes in enumerate(tables)
            ]
        )

    e = (
        _prep(embeddings, vec_col, id_col)
        .select("vid", "v", "nrm", F.explode(buckets(F.col("v"))).alias("tb"))
        .select("vid", "v", "nrm", F.col("tb.t").alias("t"), F.col("tb.b").alias("b"))
    )
    q = (
        _prep(queries, vec_col, id_col)
        .select(
            F.col("vid").alias("qid"),
            F.col("v").alias("qv"),
            F.col("nrm").alias("qn"),
            F.explode(buckets(F.col("v"))).alias("tb"),
        )
        .select("qid", "qv", "qn", F.col("tb.t").alias("t"), F.col("tb.b").alias("b"))
    )
    candidates = (
        F.broadcast(q)
        .join(e, ["t", "b"])
        .where(F.col("qid") != F.col("vid"))
        .select("qid", "qv", "qn", "vid", "v", "nrm")
        .dropDuplicates(["qid", "vid"])
    )
    scored = candidates.select(
        "qid",
        "vid",
        cosine(F.col("qv"), F.col("v"), F.col("qn"), F.col("nrm")).alias("cos"),
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("vid"))
    return (
        scored.select(
            F.col("qid").alias("query_id"),
            F.col("vid").alias("neighbor_id"),
            F.row_number().over(w).alias("rank"),
        )
        .where(F.col("rank") <= k)
    )
