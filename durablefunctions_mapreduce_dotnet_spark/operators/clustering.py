"""Distributed spherical k-means over embedding columns.

The curation pipeline's missing piece between ANN search
(operators.similarity) and near-dup clustering (operators.graph):
unsupervised TOPIC structure over an embedding corpus — the building
block for cluster-balanced sampling, domain mixing, and diversity
filtering in a training-data pipeline.  Absent from the reference
(SURVEY.md §2.2 reserves iterative algorithms for exactly this shape);
implemented as Lloyd's algorithm re-expressed in Spark's execution
model, one corpus pass per iteration.

Scale posture (100 TB):

* The corpus NEVER shuffles and is never collected: each iteration is a
  single ``mapInPandas`` pass where every Arrow batch is scored against
  the broadcast centroid matrix with one BLAS gemm and reduced to AT
  MOST k partial rows ``(cell, sum-vector)`` — a map-side combine, the
  same shape as the flagship per-file partial aggregate.
* The only shuffle per iteration moves the exploded partials
  ``(cell, pos, val)`` — ≤ tasks x k x dim tiny rows, combiner-reduced
  to k x dim before the driver sees them.  Driver/broadcast memory is
  O(k x dim), the moral equivalent of a broadcast-join build side;
  corpus size is unbounded.
* Iteration count is a fixed hyperparameter (``iters``), not
  data-dependent — no convergence probe jobs in the hot path.

Determinism (oracle-hash contract): seeds are the k LOWEST-id vectors
(``orderBy(id).limit(k)`` — TakeOrderedAndProject, no global window);
``argmax`` tie-breaks to the lowest cell on both engines; the output is
INTEGER assignments only.  Cross-engine FP skew in the summed centroids
is ~1e-14 while assignment margins between top-2 cells are O(1e-2) on
real embedding data, so the argmax decision set is stable — the same
margin argument as the IVF oracle (queries/similarity_q.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _normalize_rows(m):
    import numpy as np

    n = np.linalg.norm(m, axis=1)
    n[n == 0] = 1.0
    return m / n[:, None]


def _seed_centroids(corpus: DataFrame, k: int, vec_col: str, id_col: str):
    """k lowest-id vectors, unit-normalized — deterministic and
    oracle-mirrorable (vs. kmeans++ whose sampled seeds are not)."""
    from .similarity import _collect_matrix

    seeds = corpus.orderBy(id_col).limit(k)
    _, m = _collect_matrix(seeds, vec_col, id_col)
    return _normalize_rows(m)


def _lloyd_update(corpus: DataFrame, cm, vec_col: str):
    """One Lloyd iteration: returns the updated (k, dim) centroid matrix.

    Per-batch: gemm score -> argmax cell -> per-cell unit-vector sums
    (≤ k rows out per batch).  Spark side reduces the exploded partials
    to k x dim with a combiner-friendly groupBy; the spherical centroid
    is the NORMALIZED sum (same direction as the mean), so member counts
    never need to be carried.  Cells that lose all members (or cancel to
    a zero sum) keep their previous centroid on both engines.
    """
    import numpy as np

    spark = corpus.sparkSession
    k, dim = cm.shape
    bc = spark.sparkContext.broadcast(cm)
    rows = corpus.select(F.col(vec_col).alias("_v"))

    def part(batches):
        import pandas as pd

        c = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            v = np.stack(pdf["_v"].to_numpy()).astype(np.float64)
            vn = _normalize_rows(v)
            cell = np.argmax(vn @ c.T, axis=1)
            out = [
                (int(cc), vn[cell == cc].sum(axis=0).tolist())
                for cc in np.unique(cell)
            ]
            yield pd.DataFrame(out, columns=["cell", "sv"])

    summed = (
        rows.mapInPandas(part, "cell int, sv array<double>")
        .select("cell", F.posexplode("sv").alias("pos", "val"))
        .groupBy("cell", "pos")
        .agg(F.sum("val").alias("s"))
        .collect()
    )
    # the iteration's job is done: release the k x dim blocks now rather
    # than accumulating one stale broadcast per round for the session
    # lifetime (the FINAL assign's broadcast must outlive this function
    # and is left to Spark's reference cleanup)
    bc.destroy()
    new = cm.copy()
    acc = np.zeros((k, dim))
    seen = set()
    for r in summed:
        acc[r["cell"], r["pos"]] = r["s"]
        seen.add(r["cell"])
    for cc in seen:
        nrm = float(np.linalg.norm(acc[cc]))
        if nrm > 0:
            new[cc] = acc[cc] / nrm
    return new


def spherical_kmeans(
    corpus: DataFrame,
    k: int = 8,
    iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, cluster) assignment after ``iters`` Lloyd updates of
    spherical k-means (cosine geometry: unit-normalized vectors,
    normalized-sum centroids) seeded from the k lowest-id vectors.

    ``iters + 1`` corpus passes total (one per update + the final
    assignment); see the module docstring for the scale contract.
    """
    import numpy as np
    import pandas as pd  # noqa: F401  (executors need it importable)

    cm = _seed_centroids(corpus, k, vec_col, id_col)
    for _ in range(iters):
        cm = _lloyd_update(corpus, cm, vec_col)

    spark = corpus.sparkSession
    bc = spark.sparkContext.broadcast(cm)
    rows = corpus.select(F.col(id_col).alias(id_col), F.col(vec_col).alias("_v"))

    def assign(batches):
        import pandas as pd

        c = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            v = np.stack(pdf["_v"].to_numpy()).astype(np.float64)
            vn = _normalize_rows(v)
            cell = np.argmax(vn @ c.T, axis=1)
            yield pd.DataFrame({id_col: pdf[id_col], "cluster": cell.astype("int32")})

    return rows.mapInPandas(assign, f"{id_col} long, cluster int")
