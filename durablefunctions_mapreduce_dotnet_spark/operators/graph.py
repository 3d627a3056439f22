"""Iterative graph operators: connected components for dedup clustering.

The near-dup operators (operators.dedup) emit PAIRS; a real curation
pipeline needs per-document CLUSTER assignment (transitive closure of
the pair relation) plus a canonical-representative choice.  Absent from
the reference (its one query has no graph shape at all); built here as
an iterative DataFrame algorithm — genuinely non-SQL-single-query, the
classic case SURVEY.md §2.2 reserves for loops over DataFrames.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 30,
) -> DataFrame:
    """(node, component) where component = MIN node id reachable via the
    undirected pair relation — min-label propagation to fixpoint.

    Per iteration: one equi-join (neighbor labels) + one min-groupBy —
    two shuffles keyed on node id, both combiner-reduced; lineage is cut
    with ``localCheckpoint`` so plans stay O(1) per round instead of
    growing (swap for ``persist(DISK_ONLY)``/reliable checkpoint on a
    cluster).  Converges in O(component diameter) rounds: near-dup
    clusters are clique-ish (verified pairs), so diameter stays small
    (2-4) no matter the corpus size — at 1000-executor scale iteration
    count is corpus-independent; per-round cost is the two shuffles.
    (The O(log n) alternative for adversarial long-path graphs is
    large-star/small-star contraction — same join/agg primitives.)
    """
    edges = pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    edges = (
        edges.union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = edges.select(F.col("u").alias("n")).distinct().withColumn(
        "component", F.col("n")
    ).localCheckpoint(eager=True)
    # Convergence probe: labels are per-node MONOTONICALLY non-increasing,
    # so the total sum strictly decreases iff any label changed — a single
    # cheap aggregation on the already-checkpointed frame replaces a
    # join-based diff (one fewer shuffle per round).
    checksum = labels.agg(F.sum("component")).first()[0]
    for _ in range(max_iter):
        neighbor = (
            edges.join(
                labels.select(F.col("n").alias("v"), F.col("component")), "v"
            ).select(F.col("u").alias("n"), "component")
        )
        labels = (
            labels.union(neighbor)
            .groupBy("n")
            .agg(F.min("component").alias("component"))
            .localCheckpoint(eager=True)
        )
        new_sum = labels.agg(F.sum("component")).first()[0]
        if new_sum == checksum:
            break
        checksum = new_sum
    return labels


def canonicalize_clusters(
    universe: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Full dedup keep-list: every row of ``universe`` labeled with its
    near-dup cluster id (its own id when it has no duplicate) and a
    ``keep`` flag for the canonical (minimum-id) representative —
    the operator a training-data pipeline actually applies after pair
    generation."""
    comp = connected_components(pairs, src, dst)
    return (
        universe.select(id_col)
        .join(comp.withColumnRenamed("n", id_col), id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("component", F.col(id_col)).alias("cluster_id"),
        )
        .withColumn("keep", F.col(id_col) == F.col("cluster_id"))
    )
