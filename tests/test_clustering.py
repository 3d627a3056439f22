"""Property tests for spherical k-means (operators.clustering): coverage,
determinism across runs, monotone objective, and label coherence on the
synthetic embeddings (which carry a latent ``label``).  Hash-level
cross-engine parity is covered by test_oracle_parity / the driver via
the unrolled SQL oracle (queries/similarity_q.py)."""

from __future__ import annotations

import numpy as np

from durablefunctions_mapreduce_dotnet_spark.operators.clustering import (
    _lloyd_update,
    _seed_centroids,
    spherical_kmeans,
)
from durablefunctions_mapreduce_dotnet_spark.sources.readers import read_table

from .conftest import SF_DIR


def _objective(spark, sf_dir: str, cm) -> float:
    """Mean max-cosine of every corpus vector to its centroid."""
    pdf = read_table(spark, sf_dir, "embeddings").select("embedding").toPandas()
    v = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    v = v / np.linalg.norm(v, axis=1)[:, None]
    return float((v @ cm.T).max(axis=1).mean())


def test_kmeans_assigns_every_row_deterministically(spark):
    e = read_table(spark, SF_DIR, "embeddings")
    n = e.count()
    a = spherical_kmeans(e, k=8, iters=2).toPandas().sort_values("vec_id")
    b = spherical_kmeans(e, k=8, iters=2).toPandas().sort_values("vec_id")
    assert len(a) == n
    assert a["vec_id"].is_unique
    assert set(a["cluster"]) <= set(range(8))
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True))


def test_lloyd_updates_improve_cosine_objective(spark):
    e = read_table(spark, SF_DIR, "embeddings")
    cm = _seed_centroids(e, 8, "embedding", "vec_id")
    o0 = _objective(spark, SF_DIR, cm)
    cm = _lloyd_update(e, cm, "embedding")
    o1 = _objective(spark, SF_DIR, cm)
    cm = _lloyd_update(e, cm, "embedding")
    o2 = _objective(spark, SF_DIR, cm)
    # Lloyd monotonicity: each update weakly improves mean max-cosine
    assert o1 >= o0 - 1e-12
    assert o2 >= o1 - 1e-12
    assert o2 > o0  # and strictly overall on non-degenerate data


def test_kmeans_partition_is_nondegenerate(spark):
    """All k clusters survive 2 Lloyd updates on the synthetic corpus
    (no cluster collapse), and no cluster swallows the majority of it —
    the shape cluster-balanced sampling depends on.  (The synthetic
    ``label`` column is NOT geometrically separable — measured purity is
    at the 1/n_labels chance line — so label-coherence is deliberately
    not asserted here.)"""
    e = read_table(spark, SF_DIR, "embeddings")
    sizes = (
        spherical_kmeans(e, k=8, iters=2).groupBy("cluster").count().toPandas()
    )
    n = int(sizes["count"].sum())
    assert len(sizes) == 8
    assert int(sizes["count"].max()) < n // 2


def test_embedding_covariance_is_symmetric_psd(spark):
    """The integer-quantized covariance must reconstruct to a symmetric
    PSD matrix whose diagonal matches per-dimension variance."""
    import numpy as np

    from durablefunctions_mapreduce_dotnet_spark.operators.clustering import (
        embedding_covariance,
    )
    from durablefunctions_mapreduce_dotnet_spark.sources.readers import read_table

    e = read_table(spark, SF_DIR, "embeddings")
    rows = embedding_covariance(e).collect()
    dim = max(r["j"] for r in rows) + 1
    C = np.zeros((dim, dim))
    for r in rows:
        C[r["i"], r["j"]] = C[r["j"], r["i"]] = r["cov"]
    X = np.stack([r["embedding"] for r in e.select("embedding").collect()])
    ref = np.cov(X, rowvar=False)
    assert np.allclose(C, ref, atol=5e-6)  # quantization bias ~1e-6
    w = np.linalg.eigvalsh(C)
    assert w.min() > -1e-9  # PSD up to quantization


def test_pca_project_matches_numpy(spark):
    """pca_project vs a from-scratch numpy PCA on the raw vectors —
    components aligned per-column by best-correlation sign before
    comparing (eigenvectors are sign-ambiguous)."""
    import numpy as np

    from durablefunctions_mapreduce_dotnet_spark.operators.clustering import (
        pca_project,
    )
    from durablefunctions_mapreduce_dotnet_spark.sources.readers import read_table

    e = read_table(spark, SF_DIR, "embeddings")
    got = {
        r["vec_id"]: np.array(r["components"])
        for r in pca_project(e, n_components=4).collect()
    }
    X = np.stack([r["embedding"] for r in e.select("vec_id", "embedding").orderBy("vec_id").collect()])
    ids = [r["vec_id"] for r in e.select("vec_id").orderBy("vec_id").collect()]
    C = np.cov(X - X.mean(axis=0), rowvar=False)
    w, vecs = np.linalg.eigh(C)
    comps = vecs[:, np.argsort(w)[::-1][:4]]
    P_ref = X @ comps
    P_got = np.stack([got[i] for i in ids])
    for c in range(4):
        # align sign per component, then require tight agreement
        s = np.sign(P_ref[:, c] @ P_got[:, c]) or 1.0
        assert np.allclose(P_got[:, c], s * P_ref[:, c], atol=1e-3), c
    # explained variance must be non-increasing across components
    v = P_got.var(axis=0)
    assert all(v[i] >= v[i + 1] - 1e-9 for i in range(3))


def test_pca2d_exact_matches_numpy_eig(spark):
    """pca2d_exact's closed-form 2×2 eigensolve vs numpy.linalg.eigh on
    the numpy covariance of the same two coordinates: eigenvalues agree
    to the quantization bound (~1e-6) and the projections correlate
    perfectly with the numpy projections (sign-aligned)."""
    from durablefunctions_mapreduce_dotnet_spark.operators.clustering import (
        pca2d_exact,
    )

    e = read_table(spark, SF_DIR, "embeddings")
    out = (
        pca2d_exact(e)
        .orderBy("vec_id")
        .toPandas()
    )
    raw = (
        e.selectExpr(
            "vec_id",
            "cast(embedding[0] as double) x",
            "cast(embedding[1] as double) y",
        )
        .orderBy("vec_id")
        .toPandas()
    )
    X = raw[["x", "y"]].to_numpy()
    C = np.cov(X - X.mean(axis=0), rowvar=False)
    w, vecs = np.linalg.eigh(C)
    lam_ref = np.sort(w)[::-1]
    assert abs(out["lam1"].iloc[0] - lam_ref[0]) < 1e-5
    assert abs(out["lam2"].iloc[0] - lam_ref[1]) < 1e-5
    P_ref = (X - X.mean(axis=0)) @ vecs[:, np.argsort(w)[::-1]]
    for c, col in enumerate(("pc1", "pc2")):
        got = out[col].to_numpy()
        s = np.sign(P_ref[:, c] @ got) or 1.0
        assert np.allclose(got, s * P_ref[:, c], atol=1e-5), col
    # orthogonal rotation preserves total variance
    tot_in = X.var(axis=0, ddof=1).sum()
    tot_out = out[["pc1", "pc2"]].to_numpy().var(axis=0, ddof=1).sum()
    assert abs(tot_in - tot_out) < 1e-4
