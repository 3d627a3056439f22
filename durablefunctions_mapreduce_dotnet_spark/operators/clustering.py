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


def embedding_covariance(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    scale: int = 1_000_000,
) -> DataFrame:
    """Distributed (dim × dim) sample covariance of an embedding column
    — the second-moment building block for PCA / whitening / Mahalanobis
    outlier scoring over a vector corpus.  Returns (i, j, cov) rows for
    j ≥ i (the matrix is symmetric; materializing the upper triangle
    halves the shuffle).

    Determinism doctrine, integer-quantization flavor: per-dimension
    means come from order-free DECIMAL sums; each centered value is then
    quantized to an int ``floor(x·scale + 0.5)`` (half-up — `floor` is
    identical on every engine, unlike banker's `round`), so the
    pairwise products and their sums are EXACT integers — partition-
    order-free, retry-stable, and mirrorable in SQL with no FP margin.
    The final ``cov = Σq_i·q_j / (scale²·(n−1))`` is one IEEE divide.
    Quantization bias is bounded by scale⁻¹·E|x| per entry (~1e-6
    here) — far below estimation noise for any corpus this operator
    would profile; raise ``scale`` if a tighter bound is needed.

    Plan: one explode of the vector to (dim, value) rows (64·n — linear),
    one 64-row mean aggregate broadcast back, one self-join on the row
    id bounded to j ≥ i (64²/2 products per vector), one combiner-
    reduced integer sum per (i, j).  No driver state, no gemm — this is
    the exact-arithmetic audit path; a production PCA would run the
    float gemm kernel and cross-check against this."""
    v = df.select(F.col(id_col).alias("_id"), F.posexplode(vec_col).alias("i", "x"))
    # the davg doctrine at embedding precision: order-free decimal sum,
    # cast to double, ONE IEEE divide by the count — engine-portable
    means = v.groupBy("i").agg(
        (
            F.sum(F.col("x").cast("decimal(38,18)")).cast("double")
            / F.count(F.lit(1))
        ).alias("m")
    )
    n = df.count()
    q = v.join(F.broadcast(means), "i").select(
        "_id",
        "i",
        F.floor((F.col("x") - F.col("m")) * F.lit(float(scale)) + F.lit(0.5))
        .cast("bigint")
        .alias("q"),
    )
    a = q.select("_id", F.col("i"), F.col("q").alias("qa"))
    b = q.select("_id", F.col("i").alias("j"), F.col("q").alias("qb"))
    denom = float(scale) * float(scale) * float(n - 1)
    return (
        a.join(b, "_id")
        .where(F.col("j") >= F.col("i"))
        .groupBy("i", "j")
        .agg(F.sum(F.col("qa") * F.col("qb")).alias("_s"))
        .select(
            "i",
            "j",
            (F.col("_s").cast("double") / F.lit(denom)).alias("cov"),
        )
    )


def pca_project(
    df: DataFrame,
    n_components: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Distributed PCA projection: eigendecompose the (dim × dim)
    covariance on the driver (dim² is tiny by construction — 64² here;
    the DATA never leaves the executors) and project every vector onto
    the top ``n_components`` eigenvectors with one Arrow gemm pass.
    The standard embedding-compression move before ANN indexing: at
    100 TB the corpus-sized work is the two linear passes (covariance +
    projection); the eigh is O(dim³) driver-side, independent of corpus
    size.

    Sign convention: each eigenvector is flipped so its
    largest-magnitude entry is positive (eigenvectors are sign-
    ambiguous; without pinning, retries could emit mirrored
    projections).  Rows-only driver contract (eigh is not SQL);
    correctness is pinned against numpy on the same covariance in
    pytest."""
    import numpy as np
    import pandas as pd

    cov_rows = embedding_covariance(df, vec_col, id_col).collect()
    if not cov_rows:
        # Empty input: no covariance, no components — return an empty
        # frame with the declared schema rather than max() exploding.
        return df.sparkSession.createDataFrame(
            [], f"{id_col} bigint, components array<double>"
        )
    dim = max(r["j"] for r in cov_rows) + 1
    C = np.zeros((dim, dim))
    for r in cov_rows:
        C[r["i"], r["j"]] = C[r["j"], r["i"]] = r["cov"]
    w, vecs = np.linalg.eigh(C)
    order = np.argsort(w)[::-1][:n_components]
    comps = vecs[:, order]  # (dim, k)
    flip = np.sign(comps[np.abs(comps).argmax(axis=0), np.arange(comps.shape[1])])
    comps = comps * flip[None, :]

    def project(it):
        for pdf in it:
            X = np.stack(pdf[vec_col].to_numpy())
            P = X @ comps
            yield pd.DataFrame(
                {id_col: pdf[id_col], "components": list(P.astype(float))}
            )

    return df.select(id_col, vec_col).mapInPandas(
        project, f"{id_col} bigint, components array<double>"
    )


def pca2d_exact(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    scale: int = 1_000_000,
) -> DataFrame:
    """Fully SQL-mirrorable 2-D PCA — the hash-exact twin of
    :func:`pca_project` at a dimensionality where the eigensolve has a
    closed form both engines can evaluate identically.

    Takes the first two embedding coordinates as the feature pair,
    builds their 2×2 sample covariance [a b; b c] through the same
    integer-quantization doctrine as :func:`embedding_covariance`
    (decimal-summed means, floor(x·scale + 0.5) centering, exact
    integer product sums, ONE IEEE divide each), then solves

        λ₁,₂ = ((a + c) ± √((a−c)² + (2b)²)) / 2
        v₁   ∝ (b, λ₁ − a)            (b ≠ 0; axis fallback otherwise)

    — every step a single correctly-rounded IEEE-754 op (+, −, ×, ÷,
    √ are all exactly specified), spelled operation-for-operation the
    same in the SQL oracle, so λ and the sign-pinned unit eigenvectors
    are BIT-equal across engines with no rounding margin; the final
    per-row projections are rounded 9 dp (+0.0 canonicalized) only as
    belt-and-braces.  Sign pin: v₁ is flipped so v₁ₓ > 0 (or v₁ᵧ > 0
    when v₁ₓ = 0); v₂ is the left-normal (−v₁ᵧ, v₁ₓ).

    Scale shape: two corpus passes (moment aggregate; projection map) —
    the same linear profile as the production gemm path, with the
    eigensolve folded into the 1-row broadcast scalar frame instead of
    the driver.  Output: (id, pc1, pc2, lam1, lam2)."""
    base = df.select(
        F.col(id_col).alias("_id"),
        F.element_at(vec_col, 1).cast("double").alias("x"),
        F.element_at(vec_col, 2).cast("double").alias("y"),
    )
    s1 = base.agg(
        F.count(F.lit(1)).alias("n"),
        (
            F.sum(F.col("x").cast("decimal(38,18)")).cast("double")
            / F.count(F.lit(1))
        ).alias("mx"),
        (
            F.sum(F.col("y").cast("decimal(38,18)")).cast("double")
            / F.count(F.lit(1))
        ).alias("my"),
    )
    sc = F.lit(float(scale))
    q = base.crossJoin(F.broadcast(s1)).select(
        "n",
        "mx",
        "my",
        F.floor((F.col("x") - F.col("mx")) * sc + F.lit(0.5))
        .cast("decimal(19,0)")
        .alias("qx"),
        F.floor((F.col("y") - F.col("my")) * sc + F.lit(0.5))
        .cast("decimal(19,0)")
        .alias("qy"),
    )
    denom = sc * sc * (F.col("n") - F.lit(1)).cast("double")
    mom = (
        q.groupBy("n", "mx", "my")
        .agg(
            F.sum(F.col("qx") * F.col("qx")).alias("sxx"),
            F.sum(F.col("qx") * F.col("qy")).alias("sxy"),
            F.sum(F.col("qy") * F.col("qy")).alias("syy"),
        )
        .select(
            "n",
            "mx",
            "my",
            (F.col("sxx").cast("double") / denom).alias("a"),
            (F.col("sxy").cast("double") / denom).alias("b"),
            (F.col("syy").cast("double") / denom).alias("c"),
        )
    )
    disc = F.sqrt(
        (F.col("a") - F.col("c")) * (F.col("a") - F.col("c"))
        + (F.lit(2.0) * F.col("b")) * (F.lit(2.0) * F.col("b"))
    )
    eig = mom.select(
        "n",
        "mx",
        "my",
        "a",
        "b",
        "c",
        ((F.col("a") + F.col("c")) + disc).alias("_2l1"),
        ((F.col("a") + F.col("c")) - disc).alias("_2l2"),
    ).select(
        "mx",
        "my",
        (F.col("_2l1") / F.lit(2.0)).alias("lam1"),
        (F.col("_2l2") / F.lit(2.0)).alias("lam2"),
        F.col("a"),
        F.col("b"),
        F.col("c"),
    )
    # unit eigenvector for lam1 with deterministic sign: (b, lam1 - a)
    # normalized, flipped positive; b == 0 falls back to the axes.
    vx0 = F.col("b")
    vy0 = (F.col("lam1") - F.col("a"))
    nrm = F.sqrt(vx0 * vx0 + vy0 * vy0)
    # b == 0 ⇒ the matrix is already diagonal: a ≥ c picks the x axis
    # (a is the dominant variance), else the y axis.  Compared EXACTLY
    # (a vs c, both raw moments) rather than a vs the FP-computed lam1,
    # whose ((a+c)+|a−c|)/2 rounding can land one ulp above max(a, c)
    # and flip the branch to the wrong axis.
    vecs = eig.select(
        "mx",
        "my",
        "lam1",
        "lam2",
        F.when(F.col("b") != 0.0, vx0 / nrm)
        .when(F.col("a") >= F.col("c"), F.lit(1.0))
        .otherwise(F.lit(0.0))
        .alias("_ux"),
        F.when(F.col("b") != 0.0, vy0 / nrm)
        .when(F.col("a") >= F.col("c"), F.lit(0.0))
        .otherwise(F.lit(1.0))
        .alias("_uy"),
    ).select(
        "mx",
        "my",
        "lam1",
        "lam2",
        F.when(
            (F.col("_ux") < 0.0)
            | ((F.col("_ux") == 0.0) & (F.col("_uy") < 0.0)),
            -F.col("_ux"),
        )
        .otherwise(F.col("_ux"))
        .alias("v1x"),
        F.when(
            (F.col("_ux") < 0.0)
            | ((F.col("_ux") == 0.0) & (F.col("_uy") < 0.0)),
            -F.col("_uy"),
        )
        .otherwise(F.col("_uy"))
        .alias("v1y"),
    )
    r9 = lambda col: F.round(col, 9) + F.lit(0.0)  # noqa: E731
    return base.crossJoin(F.broadcast(vecs)).select(
        F.col("_id").alias(id_col),
        r9(
            (F.col("x") - F.col("mx")) * F.col("v1x")
            + (F.col("y") - F.col("my")) * F.col("v1y")
        ).alias("pc1"),
        r9(
            (F.col("x") - F.col("mx")) * (-F.col("v1y"))
            + (F.col("y") - F.col("my")) * F.col("v1x")
        ).alias("pc2"),
        r9(F.col("lam1")).alias("lam1"),
        r9(F.col("lam2")).alias("lam2"),
    )
