"""Similarity search over embedding columns (north-star scope).

Three paths:
* brute-force cosine top-k — the exactness baseline: the (dimension-table
  sized) query matrix is broadcast, the corpus streams through
  ``mapInPandas`` one Arrow batch at a time, each batch is scored with a
  single BLAS gemm, and only per-batch partial top-k survivors (a
  map-side combine) reach the final exact per-query window.
* random-hyperplane LSH — bucket both sides by numpy sign signature,
  equi-join on (table, bucket), score only candidates.
* IVF — assign every corpus row to its nearest seed centroid in the same
  gemm pass that scores it against the queries probing that cell.

Round-1 lesson (bench): per-pair higher-order-function cosines are
interpreted, not codegen'd (~100 ns/element) — 17.7 s of a 38.8 s bench.
All heavy math is now Arrow-batched numpy; the only JVM-side work is the
scan and the final windowed top-k over ~batches x |Q| x k survivor rows.

Scale posture (100 TB): the corpus NEVER shuffles and is never
materialized as pairs — each executor reads its parquet split and emits
at most |Q| x k rows per batch.  Driver/broadcast memory is O(|Q| x dim)
(the query set is small by contract, exactly like a broadcast-join build
side); corpus size is unbounded.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _vec_rows(df: DataFrame, vec_col: str, id_col: str) -> DataFrame:
    """(_id, _v) projection — raw storage type; numpy widens to float64
    exactly, so no per-element JVM cast runs at all."""
    return df.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))


def _collect_matrix(df: DataFrame, vec_col: str, id_col: str):
    """Driver-side (ids, float64 matrix) of a SMALL side (query set /
    centroids) — the moral equivalent of a broadcast-join build side."""
    import numpy as np

    pdf = _vec_rows(df, vec_col, id_col).toPandas()
    ids = pdf["_id"].to_numpy(dtype=np.int64)
    m = np.stack(pdf["_v"].to_numpy()).astype(np.float64)
    return ids, m


def _topk_window(partial: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("vid"))
    return (
        partial.select(
            F.col("qid").alias("query_id"),
            F.col("vid").alias("neighbor_id"),
            F.row_number().over(w).alias("rank"),
        )
        .where(F.col("rank") <= k)
    )


def brute_force_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact cosine top-k for each query vector.

    queries: subset of ``embeddings`` (same schema).  Per Arrow batch:
    one gemm against the broadcast query matrix, then an exact
    (cos desc, vid asc) lexsort partial top-k per query — ties included,
    so the global window sees every row that could make the true top-k.
    """
    import numpy as np
    import pandas as pd

    spark = embeddings.sparkSession
    qids, qm = _collect_matrix(queries, vec_col, id_col)
    qn = np.linalg.norm(qm, axis=1)
    bc = spark.sparkContext.broadcast((qids, qm, qn))

    def gen(batches):
        b_qids, b_qm, b_qn = bc.value
        for batch in batches:
            if not len(batch):
                continue
            ids = batch["_id"].to_numpy(dtype=np.int64)
            m = np.stack(batch["_v"].to_numpy()).astype(np.float64)
            nrm = np.linalg.norm(m, axis=1)
            # dot / (|a| |b|): same algebraic shape as the SQL oracle
            scores = (m @ b_qm.T) / (nrm[:, None] * b_qn[None, :])
            out = []
            for j in range(len(b_qids)):
                col = scores[:, j]
                mask = ids != b_qids[j]
                cand_ids, cand = ids[mask], col[mask]
                if not len(cand_ids):
                    continue
                # exact partial top-k under the FINAL total order
                # (cos desc, vid asc) — safe under cosine ties
                order = np.lexsort((cand_ids, -cand))[:k]
                out.append(
                    pd.DataFrame(
                        {
                            "qid": np.full(len(order), b_qids[j], dtype=np.int64),
                            "vid": cand_ids[order],
                            "cos": cand[order],
                        }
                    )
                )
            if out:
                yield pd.concat(out, ignore_index=True)

    partial = _vec_rows(embeddings, vec_col, id_col).mapInPandas(
        gen, "qid bigint, vid bigint, cos double"
    )
    return _topk_window(partial, k)


def filtered_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    filter_col: str = "label",
    negate: bool = False,
) -> DataFrame:
    """METADATA-FILTERED exact cosine top-k — the constrained vector
    search every production retrieval stack needs (tenant-scoped,
    same-language, time-fenced): each query retrieves only corpus rows
    whose ``filter_col`` equals its own.

    The filter applies INSIDE the scoring kernel, not as a post-rank
    cut: post-filtering a plain top-k silently under-fills whenever
    fewer than k of the unconstrained neighbors share the attribute —
    the classic filtered-ANN correctness trap.  Per Arrow batch the
    corpus gemm is shared across all queries and the per-query
    eligibility mask (attribute match + self-exclusion) is applied to
    the score column before the exact (cos desc, id) partial top-k, so
    the plan stays ONE corpus pass with a broadcast query matrix and no
    shuffle of vectors — same 100 TB posture as brute_force_topk; at
    scale a highly selective attribute instead pushes down as a
    partition/scan filter and degenerates to the unfiltered kernel.

    ``negate=True`` flips the eligibility to ``filter_col`` INEQUALITY
    — hard-negative mining for contrastive training: the most similar
    corpus rows that are NOT the query's own class/source are exactly
    the negatives a retriever trains against.  NULL semantics stay
    SQL's in both modes: a NULL label on either side is never eligible
    (mirroring ``a <> b``, which is NULL — not TRUE — under NULLs)."""
    import numpy as np
    import pandas as pd

    spark = embeddings.sparkSession
    qpdf = queries.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_v"),
        F.col(filter_col).alias("_f"),
    ).toPandas()
    qids = qpdf["_id"].to_numpy(dtype=np.int64)
    qm = np.stack(qpdf["_v"].to_numpy()).astype(np.float64)
    # Labels stay generic (object dtype): filter_col may be int, string,
    # float, or nullable — SQL `=` semantics, so a NULL label on either
    # side matches nothing (the oracle's equality join drops NULLs too).
    qf = qpdf["_f"].to_numpy(dtype=object)
    qn = np.linalg.norm(qm, axis=1)
    bc = spark.sparkContext.broadcast((qids, qm, qn, qf))

    def gen(batches):
        b_qids, b_qm, b_qn, b_qf = bc.value
        for batch in batches:
            if not len(batch):
                continue
            ids = batch["_id"].to_numpy(dtype=np.int64)
            labs = batch["_f"].to_numpy(dtype=object)
            lab_ok = ~pd.isnull(labs)
            m = np.stack(batch["_v"].to_numpy()).astype(np.float64)
            nrm = np.linalg.norm(m, axis=1)
            scores = (m @ b_qm.T) / (nrm[:, None] * b_qn[None, :])
            out = []
            for j in range(len(b_qids)):
                if pd.isnull(b_qf[j]):
                    continue
                same = labs == b_qf[j]
                mask = (ids != b_qids[j]) & lab_ok & (~same if negate else same)
                cand_ids, cand = ids[mask], scores[mask, j]
                if not len(cand_ids):
                    continue
                order = np.lexsort((cand_ids, -cand))[:k]
                out.append(
                    pd.DataFrame(
                        {
                            "qid": np.full(len(order), b_qids[j], dtype=np.int64),
                            "vid": cand_ids[order],
                            "cos": cand[order],
                        }
                    )
                )
            if out:
                yield pd.concat(out, ignore_index=True)

    partial = embeddings.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_v"),
        F.col(filter_col).alias("_f"),
    ).mapInPandas(gen, "qid bigint, vid bigint, cos double")
    return _topk_window(partial, k)


def mmr_rerank(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_candidates: int = 20,
    lam: float = 0.5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    candidates: "DataFrame | None" = None,
) -> DataFrame:
    """Maximal-marginal-relevance diversified re-rank (Carbonell &
    Goldstein 1998) — the standard redundancy cut of a retrieval/RAG
    stack: from each query's exact top-``n_candidates``, greedily pick
    ``k`` results maximizing ``λ·sim(q,d) − (1−λ)·max_{s∈S} sim(d,s)``
    so near-duplicate hits don't crowd the result list.

    ``candidates`` (optional, columns query_id/neighbor_id) replaces
    the internal brute-force top-``n_candidates`` with a precomputed
    retrieval stage — e.g. ``filtered_topk`` or an IVF probe — so a
    RAG pipeline can compose retrieve→MMR without a second corpus
    pass; the greedy loop is agnostic to where candidates came from
    (every query_id must appear in ``queries``).

    Scale shape: candidate generation is the one corpus-sized pass
    (the shared brute/IVF kernels); the MMR loop itself runs per query
    over ≤ n_candidates rows inside one ``applyInPandas`` group — the
    candidate matrix gemm is (n_cand)², driver state zero, and the
    corpus is never touched again.  Ties break (score desc, id asc) at
    every pick, so output ids are deterministic; the oracle unrolls the
    k greedy iterations in SQL and must agree pick for pick."""
    import numpy as np
    import pandas as pd

    spark = embeddings.sparkSession
    qids, qm = _collect_matrix(queries, vec_col, id_col)
    qn = np.linalg.norm(qm, axis=1)
    bc = spark.sparkContext.broadcast(
        ({int(q): j for j, q in enumerate(qids)}, qm, qn)
    )
    cand = (
        candidates.select("query_id", "neighbor_id")
        if candidates is not None
        else brute_force_topk(
            embeddings, queries, k=n_candidates, vec_col=vec_col, id_col=id_col
        )
    )
    cv = cand.join(
        embeddings.select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_v")
        ),
        "neighbor_id",
    ).select("query_id", "neighbor_id", "_v")

    def mmr(key, pdf):
        qmap, b_qm, b_qn = bc.value
        j = qmap[int(key[0])]
        qv, qnorm = b_qm[j], b_qn[j]
        ids = pdf["neighbor_id"].to_numpy(dtype=np.int64)
        m = np.stack(pdf["_v"].to_numpy()).astype(np.float64)
        nrm = np.linalg.norm(m, axis=1)
        rel = (m @ qv) / (nrm * qnorm)
        simm = (m @ m.T) / (nrm[:, None] * nrm[None, :])
        picked: list[int] = []
        avail = np.ones(len(ids), dtype=bool)
        out_ids, out_rank = [], []
        for t in range(1, min(k, len(ids)) + 1):
            if t == 1:
                score = rel.copy()
            else:
                worst = simm[:, picked].max(axis=1)
                score = lam * rel - (1.0 - lam) * worst
            score = np.where(avail, score, -np.inf)
            # argmax with (score desc, id asc): lexsort on (-score, id)
            best = np.lexsort((ids, -score))[0]
            picked.append(best)
            avail[best] = False
            out_ids.append(ids[best])
            out_rank.append(t)
        return pd.DataFrame(
            {
                "query_id": np.full(len(out_ids), key[0], dtype=np.int64),
                "neighbor_id": np.array(out_ids, dtype=np.int64),
                "rank": np.array(out_rank, dtype=np.int32),
            }
        )

    return cv.groupBy("query_id").applyInPandas(
        mmr, "query_id bigint, neighbor_id bigint, rank int"
    )


def make_planes(dim: int, num_planes: int = 8, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-Gaussian hyperplanes (sum of uniforms), no
    numpy dependency in the plan — planes are baked in as literals."""
    rng = random.Random(seed)
    return [
        [sum(rng.uniform(-1, 1) for _ in range(6)) for _ in range(dim)]
        for _ in range(num_planes)
    ]


def _signature_udf(tables: list[list[list[float]]]):
    """pandas_udf: embedding -> array<int> of per-table sign-bucket ids.
    One einsum per batch over all tables' planes at once."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    planes = np.array(tables, dtype=np.float64)  # (L, p, d)
    weights = 1 << np.arange(planes.shape[1], dtype=np.int64)  # (p,)

    def _sig(vs):
        m = np.stack(vs.to_numpy()).astype(np.float64)  # (n, d)
        dots = np.einsum("nd,lpd->nlp", m, planes)
        buckets = ((dots > 0).astype(np.int64) * weights[None, None, :]).sum(axis=2)
        return pd.Series(list(buckets.astype(np.int32)))  # (n, L)

    _sig.__annotations__ = {"vs": pd.Series, "return": pd.Series}
    return pandas_udf("array<int>")(_sig)


def cosine_pairs_udf():
    """pandas_udf: row-wise cosine of two vector columns (norms computed
    in-batch) — the vectorized scorer for candidate pairs from a join."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _cos(a, b):
        am = np.stack(a.to_numpy()).astype(np.float64)
        bm = np.stack(b.to_numpy()).astype(np.float64)
        return pd.Series(
            np.einsum("ij,ij->i", am, bm)
            / (np.linalg.norm(am, axis=1) * np.linalg.norm(bm, axis=1))
        )

    _cos.__annotations__ = {"a": pd.Series, "b": pd.Series, "return": pd.Series}
    return pandas_udf("double")(_cos)


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_lists: int = 16,
    n_probe: int = 4,
    refine_iters: int = 0,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k — the second scale path
    beside LSH.

    Coarse quantizer: the ``n_lists`` lowest-id vectors serve as
    deterministic seed centroids.  ``refine_iters > 0`` runs that many
    spherical-Lloyd updates over the corpus first
    (``clustering._lloyd_update`` — one shuffle-free gemm pass each,
    driver state O(k·dim)), turning the arbitrary seeds into real
    cluster centers: lists get balanced, so at equal ``n_probe`` the
    probed fraction of the corpus contains more of each query's true
    neighbors (recall improvement pytest-checked,
    tests/test_llm_ops.py::test_ivf_refined_centroids_improve_recall).
    The default 0 keeps the oracle-mirrorable plan (the SQL oracle
    bakes seed centroids; refinement only changes centroid VALUES, not
    the plan shape).  Seeds come from ``orderBy(id).limit(n_lists)`` —
    a ``TakeOrderedAndProject``, not a global window — and are
    broadcast together with the query matrix and each query's
    ``n_probe`` nearest cells (computed driver-side: |Q| x n_lists is
    tiny).

    Search is one corpus pass: each Arrow batch assigns its rows to
    cells (argmax against the centroid matrix) and scores them against
    exactly the queries probing those cells — the classic inverted-list
    probe, O(|Q| * N * n_probe / n_lists) instead of O(|Q| * N), with no
    corpus shuffle and no pair materialization.  Recall is
    pytest-checked against brute force."""
    import numpy as np
    import pandas as pd

    spark = embeddings.sparkSession
    cents = (
        _vec_rows(embeddings, vec_col, id_col).orderBy("_id").limit(n_lists).toPandas()
    )
    cm = np.stack(cents["_v"].to_numpy()).astype(np.float64)
    cm = cm / np.linalg.norm(cm, axis=1, keepdims=True)
    if refine_iters > 0:
        from .clustering import _lloyd_update

        vecs = _vec_rows(embeddings, vec_col, id_col)
        for _ in range(refine_iters):
            cm = _lloyd_update(vecs, cm, "_v")

    qids, qm = _collect_matrix(queries, vec_col, id_col)
    qn = np.linalg.norm(qm, axis=1)
    # per-query probe cells: top-n_probe by (cosine desc, cell asc)
    qs = (qm @ cm.T) / qn[:, None]
    cells_idx = np.arange(cm.shape[0])
    probes = np.stack(
        [np.lexsort((cells_idx, -qs[i]))[:n_probe] for i in range(len(qids))]
    )
    # cell -> indices of queries probing it
    cell_to_q = {
        c: np.nonzero((probes == c).any(axis=1))[0] for c in range(cm.shape[0])
    }
    bc = spark.sparkContext.broadcast((qids, qm, qn, cm, cell_to_q))

    def gen(batches):
        b_qids, b_qm, b_qn, b_cm, b_cq = bc.value
        for batch in batches:
            if not len(batch):
                continue
            ids = batch["_id"].to_numpy(dtype=np.int64)
            m = np.stack(batch["_v"].to_numpy()).astype(np.float64)
            nrm = np.linalg.norm(m, axis=1)
            # cell assignment: argmax cosine (centroids pre-normalized);
            # np.argmax takes the FIRST max -> lowest cell on ties
            cell = np.argmax((m @ b_cm.T) / nrm[:, None], axis=1)
            out = []
            for c in np.unique(cell):
                qidx = b_cq.get(int(c))
                if qidx is None or not len(qidx):
                    continue
                rows = np.nonzero(cell == c)[0]
                scores = (m[rows] @ b_qm[qidx].T) / (
                    nrm[rows][:, None] * b_qn[qidx][None, :]
                )
                for jj, qj in enumerate(qidx):
                    col = scores[:, jj]
                    mask = ids[rows] != b_qids[qj]
                    cand_ids, cand = ids[rows][mask], col[mask]
                    if not len(cand_ids):
                        continue
                    order = np.lexsort((cand_ids, -cand))[:k]
                    out.append(
                        pd.DataFrame(
                            {
                                "qid": np.full(len(order), b_qids[qj], dtype=np.int64),
                                "vid": cand_ids[order],
                                "cos": cand[order],
                            }
                        )
                    )
            if out:
                yield pd.concat(out, ignore_index=True)

    partial = _vec_rows(embeddings, vec_col, id_col).mapInPandas(
        gen, "qid bigint, vid bigint, cos double"
    )
    return _topk_window(partial, k)


def ivf_filtered_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    filter_col: str = "label",
    n_lists: int = 16,
    n_probe: int = 4,
) -> DataFrame:
    """Metadata-filtered IVF top-k — the SCALE path of
    ``filtered_topk``: the same deterministic seed-centroid inverted
    lists as ``ivf_topk`` (probing is attribute-blind — cells are
    geometry-only), with the per-query eligibility mask (label
    equality + self-exclusion, SQL ``=`` semantics so NULL matches
    nothing) applied inside the per-cell scoring exactly as the exact
    kernel applies it.  k under-fills only when the probed cells
    genuinely lack k same-label rows — the recall cost that
    ``ann_filtered_recall`` measures; at ``n_probe = n_lists`` the
    probe is exhaustive and the result equals ``filtered_topk``
    bit-for-bit (the exact-twin discipline of the other ANN tiers).

    One corpus pass, O(|Q| * N * n_probe / n_lists) scoring, broadcast
    query matrix + centroids, no vector shuffle — same 100 TB posture
    as ``ivf_topk``."""
    import numpy as np
    import pandas as pd

    spark = embeddings.sparkSession
    cents = (
        _vec_rows(embeddings, vec_col, id_col).orderBy("_id").limit(n_lists).toPandas()
    )
    cm = np.stack(cents["_v"].to_numpy()).astype(np.float64)
    cm = cm / np.linalg.norm(cm, axis=1, keepdims=True)
    qpdf = queries.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_v"),
        F.col(filter_col).alias("_f"),
    ).toPandas()
    qids = qpdf["_id"].to_numpy(dtype=np.int64)
    qm = np.stack(qpdf["_v"].to_numpy()).astype(np.float64)
    qf = qpdf["_f"].to_numpy(dtype=object)
    qn = np.linalg.norm(qm, axis=1)
    qsim = (qm @ cm.T) / qn[:, None]
    cells_idx = np.arange(cm.shape[0])
    probes = np.stack(
        [np.lexsort((cells_idx, -qsim[i]))[:n_probe] for i in range(len(qids))]
    )
    cell_to_q = {
        c: np.nonzero((probes == c).any(axis=1))[0] for c in range(cm.shape[0])
    }
    bc = spark.sparkContext.broadcast((qids, qm, qn, qf, cm, cell_to_q))

    def gen(batches):
        b_qids, b_qm, b_qn, b_qf, b_cm, b_cq = bc.value
        for batch in batches:
            if not len(batch):
                continue
            ids = batch["_id"].to_numpy(dtype=np.int64)
            labs = batch["_f"].to_numpy(dtype=object)
            lab_ok = ~pd.isnull(labs)
            m = np.stack(batch["_v"].to_numpy()).astype(np.float64)
            nrm = np.linalg.norm(m, axis=1)
            cell = np.argmax((m @ b_cm.T) / nrm[:, None], axis=1)
            out = []
            for c in np.unique(cell):
                qidx = b_cq.get(int(c))
                if qidx is None or not len(qidx):
                    continue
                rows = np.nonzero(cell == c)[0]
                scores = (m[rows] @ b_qm[qidx].T) / (
                    nrm[rows][:, None] * b_qn[qidx][None, :]
                )
                for jj, qj in enumerate(qidx):
                    if pd.isnull(b_qf[qj]):
                        continue
                    mask = (
                        (ids[rows] != b_qids[qj])
                        & lab_ok[rows]
                        & (labs[rows] == b_qf[qj])
                    )
                    cand_ids, cand = ids[rows][mask], scores[:, jj][mask]
                    if not len(cand_ids):
                        continue
                    order = np.lexsort((cand_ids, -cand))[:k]
                    out.append(
                        pd.DataFrame(
                            {
                                "qid": np.full(
                                    len(order), b_qids[qj], dtype=np.int64
                                ),
                                "vid": cand_ids[order],
                                "cos": cand[order],
                            }
                        )
                    )
            if out:
                yield pd.concat(out, ignore_index=True)

    partial = embeddings.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_v"),
        F.col(filter_col).alias("_f"),
    ).mapInPandas(gen, "qid bigint, vid bigint, cos double")
    return _topk_window(partial, k)


def ivf_seed_centroids(
    history: DataFrame,
    n_lists: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
):
    """The FROZEN coarse-quantizer asset of an IVF index: the
    ``n_lists`` lowest-id vectors of the stored corpus, L2-normalized —
    exactly the deterministic seed construction ``ivf_topk`` uses, but
    materialized driver-side as the persisted artifact an incremental
    maintenance pass assigns against.  O(n_lists x dim) driver memory
    (a broadcast build side), one ``TakeOrderedAndProject`` scan."""
    import numpy as np

    cents = (
        _vec_rows(history, vec_col, id_col).orderBy("_id").limit(n_lists).toPandas()
    )
    cm = np.stack(cents["_v"].to_numpy()).astype(np.float64)
    return cm / np.linalg.norm(cm, axis=1, keepdims=True)


def ivf_assign(
    embeddings: DataFrame,
    centroids,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Cell assignment against a FROZEN (pre-normalized) centroid
    matrix — the maintenance half of an IVF index, split out of
    ``ivf_topk``'s fused search kernel so a recurring-crawl pipeline
    can assign a NEW batch without touching the stored corpus.

    One gemm pass per Arrow batch, argmax cosine with the same
    tie-break as search (np.argmax takes the first max -> lowest
    cell), no shuffle: each executor reads its split and emits one
    (id, cell) scalar row per vector.  Assignment is per-row
    independent, so batch-wise application trivially equals
    from-scratch application — pinned by
    tests/test_llm_ops.py::test_ivf_assign_incremental_equals_scratch.

    A zero-norm vector has no cosine direction, so its argmax would
    silently land in cell 0 via NaN propagation; like
    ``seasonal_decompose``'s even-period discipline, the operator
    refuses loudly instead (pytest-pinned) — drop or impute zero
    vectors upstream."""
    import numpy as np
    import pandas as pd

    spark = embeddings.sparkSession
    bc = spark.sparkContext.broadcast(np.asarray(centroids, dtype=np.float64))

    def gen(batches):
        cm = bc.value
        for batch in batches:
            if not len(batch):
                continue
            ids = batch["_id"].to_numpy(dtype=np.int64)
            m = np.stack(batch["_v"].to_numpy()).astype(np.float64)
            nrm = np.linalg.norm(m, axis=1)
            if not nrm.all():
                bad = ids[nrm == 0.0][:5].tolist()
                raise ValueError(
                    "ivf_assign: zero-norm vector(s) have no cosine "
                    f"direction (ids {bad}...); drop or impute them "
                    "before assignment"
                )
            cell = np.argmax((m @ cm.T) / nrm[:, None], axis=1)
            yield pd.DataFrame({id_col: ids, "cell": cell.astype(np.int32)})

    return _vec_rows(embeddings, vec_col, id_col).mapInPandas(
        gen, f"{id_col} bigint, cell int"
    )


def ivf_cell_drift(
    history_assign: DataFrame,
    batch_assign: DataFrame,
    n_lists: int = 16,
    retrain_threshold: float = 0.02,
) -> DataFrame:
    """Per-cell occupancy drift report — the retrain trigger of an
    incrementally-maintained IVF index: for every cell, the stored
    corpus's occupancy share vs the new batch's, their signed delta,
    and a ``retrain`` flag when |delta| exceeds ``retrain_threshold``
    (a drifting crawl distribution unbalances the inverted lists and
    recall at fixed n_probe decays — the standard re-cluster signal).

    All 100 TB of assignments reduce to two n_lists-row count
    aggregates (map-side combined) before anything else happens; the
    join onto the literal cell spine and the share arithmetic run on
    n_lists rows.  Shares are double divisions of exact integer
    counts, so the report is bit-deterministic cross-engine (IEEE 754
    division is exactly rounded — no decimal scaffolding needed).
    An EMPTY side (total 0) has no share distribution, so ``drift``
    and ``retrain`` are explicitly NULL for every cell rather than a
    divide-by-zero whose NULL/NaN/Inf spelling differs between
    engines (pytest-pinned)."""
    spark = history_assign.sparkSession
    cells = spark.range(n_lists).select(F.col("id").cast("int").alias("cell"))
    h = history_assign.groupBy("cell").agg(F.count(F.lit(1)).alias("hist_n"))
    b = batch_assign.groupBy("cell").agg(F.count(F.lit(1)).alias("batch_n"))
    rep = (
        cells.join(F.broadcast(h), "cell", "left")
        .join(F.broadcast(b), "cell", "left")
        .fillna(0, subset=["hist_n", "batch_n"])
    )
    # totals as a broadcast 1-row crossJoin (the graph_pagerank
    # dangling-mass pattern) — an unpartitioned window here would be
    # harmless at n_lists rows but spams single-partition warnings in
    # every driver log
    totals = rep.agg(
        F.sum("hist_n").alias("_ht"), F.sum("batch_n").alias("_bt")
    )
    rep = rep.crossJoin(F.broadcast(totals))
    share_b = F.when(F.col("_bt") > 0, F.col("batch_n") / F.col("_bt"))
    share_h = F.when(F.col("_ht") > 0, F.col("hist_n") / F.col("_ht"))
    drift = share_b - share_h  # NULL when either side is empty
    return rep.select(
        "cell",
        "hist_n",
        "batch_n",
        drift.alias("drift"),
        (F.abs(drift) > F.lit(retrain_threshold)).alias("retrain"),
    )


def quantize_embeddings_int8(
    df: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """Per-vector symmetric int8 scalar quantization — the 100 TB
    memory lever for the vector surface: 4× smaller than float32 (8×
    vs the float64 the JVM hands numpy), int8 gemms run on the CPU's
    integer SIMD, and quantized DOT PRODUCTS are exact integers, so
    downstream ranking is engine-portable with no FP scaffolding.

    ``scale = max|x| / 127`` per vector; ``q[i] = round(x[i]/scale)``
    in [-127, 127].  Pure codegen'd array expressions (transform /
    array_max / round) pipelined into the scan; round is HALF-AWAY on
    both engines (Spark BigDecimal HALF_UP on doubles = away from
    zero; DuckDB/C round likewise), so the quantized vectors mirror
    bit-for-bit into SQL.  Zero vectors quantize to zeros with
    scale 1.0 (guarded division).
    """
    v = F.col(vec_col)
    mx = F.array_max(F.transform(v, lambda x: F.abs(x)))
    scale = F.when(mx == 0.0, F.lit(1.0)).otherwise(mx / F.lit(127.0))
    return df.select(
        F.col(id_col),
        F.transform(v, lambda x: F.round(x / scale).cast("int")).alias("q"),
        scale.alias("scale"),
    )


def quantized_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Top-k by EXACT-INTEGER quantized dot product — the brute-force
    scorer run on int8-quantized vectors: same broadcast-queries /
    stream-corpus / per-batch-gemm shape as :func:`brute_force_topk`,
    but the score ``Σ q_a[i]·q_b[i]`` is integer arithmetic (≤ 127²·dim
    ≪ 2⁶³), so results hash-match the SQL oracle exactly — no cosine
    FP anywhere.  Production rescoring (exact cosine over the top-k′
    survivors) composes by joining the result back to the float
    vectors; the ranking signal this returns is the quantized score
    itself, deterministically tie-broken by id.
    """
    import numpy as np
    import pandas as pd

    spark = embeddings.sparkSession
    qz = quantize_embeddings_int8(embeddings, vec_col, id_col)
    q_side = quantize_embeddings_int8(queries, vec_col, id_col).toPandas()
    qids = q_side[id_col].to_numpy(dtype=np.int64)
    qm = np.stack(q_side["q"].to_numpy()).astype(np.int64)
    bc = spark.sparkContext.broadcast((qids, qm))

    def gen(batches):
        b_qids, b_qm = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            m = np.stack(pdf["q"].to_numpy()).astype(np.int64)
            scores = m @ b_qm.T  # (batch, |Q|) exact int64
            out = []
            for j, qid in enumerate(b_qids):
                col = scores[:, j]
                mask = ids != qid
                cand_ids, cand = ids[mask], col[mask]
                if not len(cand_ids):
                    continue
                order = np.lexsort((cand_ids, -cand))[:k]
                out.append(
                    pd.DataFrame(
                        {
                            "qid": np.full(len(order), qid, dtype=np.int64),
                            "vid": cand_ids[order],
                            "dot_q": cand[order],
                        }
                    )
                )
            if out:
                yield pd.concat(out, ignore_index=True)

    partial = qz.select(id_col, "q").mapInPandas(
        gen, "qid bigint, vid bigint, dot_q bigint"
    )
    w = Window.partitionBy("qid").orderBy(F.desc("dot_q"), F.asc("vid"))
    return (
        partial.select(
            F.col("qid").alias("query_id"),
            F.col("vid").alias("neighbor_id"),
            F.col("dot_q"),
            F.row_number().over(w).cast("bigint").alias("rank"),
        )
        .where(F.col("rank") <= k)
    )


def quantized_rescored_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    prefilter_k: int = 20,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """The production two-stage ANN: int8-quantized prefilter
    (:func:`quantized_topk`, top ``prefilter_k`` per query) followed by
    EXACT-cosine rescoring of only those candidates — quantization's
    memory/speed win on the full corpus scan, float precision on the
    |Q|·prefilter_k survivors.  The rescore join broadcasts the
    candidate list (driver-small by construction) onto the vector
    table, so the corpus is scanned once more but never shuffled."""
    cand = quantized_topk(
        embeddings, queries, prefilter_k, vec_col, id_col
    ).select("query_id", "neighbor_id")
    # Query vectors come from the QUERIES frame, neighbor vectors from
    # the corpus: the signature permits queries that are not a subset of
    # embeddings (ad-hoc probes), and a corpus-side lookup would then
    # silently drop every candidate.
    ev = _vec_rows(embeddings, vec_col, id_col)
    qv = _vec_rows(queries, vec_col, id_col)
    cos = cosine_pairs_udf()
    scored = (
        F.broadcast(cand)
        .join(qv.select(F.col("_id").alias("query_id"), F.col("_v").alias("_qv")), "query_id")
        .join(ev.select(F.col("_id").alias("neighbor_id"), F.col("_v").alias("_nv")), "neighbor_id")
        .select("query_id", "neighbor_id", cos(F.col("_qv"), F.col("_nv")).alias("cos"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.select(
            "query_id",
            "neighbor_id",
            F.row_number().over(w).cast("bigint").alias("rank"),
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

    Each of L tables hashes vectors into 2^p sign-buckets (numpy
    signature, one einsum per batch); candidates are the union over
    tables of same-bucket pairs, scored vectorized, deduped on scalar
    (qid, vid, cos) rows — vectors never ride the dedup shuffle — then
    windowed top-k.  Recall for a neighbor at cosine c is
    1-(1-(1-acos(c)/pi)^p)^L — tune (p, L) to the corpus.  The join is a
    plain equi-join on (table, bucket): O(|Q|*|C|/2^p*L) instead of
    O(|Q|*|C|).
    """
    tables = [
        make_planes(dim, planes_per_table, seed + 1000 * t) for t in range(num_tables)
    ]
    sig = _signature_udf(tables)
    cos = cosine_pairs_udf()

    e = (
        _vec_rows(embeddings, vec_col, id_col)
        .select("_id", "_v", F.posexplode(sig(F.col("_v"))).alias("t", "b"))
        .select(F.col("_id").alias("vid"), F.col("_v").alias("v"), "t", "b")
    )
    q = (
        _vec_rows(queries, vec_col, id_col)
        .select("_id", "_v", F.posexplode(sig(F.col("_v"))).alias("t", "b"))
        .select(F.col("_id").alias("qid"), F.col("_v").alias("qv"), "t", "b")
    )
    scored = (
        F.broadcast(q)
        .join(e, ["t", "b"])
        .where(F.col("qid") != F.col("vid"))
        .select("qid", "vid", cos(F.col("qv"), F.col("v")).alias("cos"))
        .dropDuplicates(["qid", "vid"])
    )
    return _topk_window(scored, k)


def pq_train(
    embeddings: DataFrame,
    m: int = 8,
    ksub: int = 64,
    iters: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
):
    """Product-quantization codebooks (Jégou et al. 2011): split each
    dim-d vector into ``m`` subvectors of d/m dims and train an
    independent ``ksub``-centroid L2 codebook per subspace with
    distributed Lloyd iterations.  Returns a driver-side numpy array of
    shape (m, ksub, d/m) — O(m·ksub·d) floats, corpus-independent, the
    broadcastable asset of the PQ index.

    Seeding is deterministic (the ``ksub`` lowest-id vectors'
    subvectors, the ``ivf_topk`` convention).  Each iteration is ONE
    corpus pass: every Arrow batch assigns all m subspaces and emits
    per-(subspace, codeword) partial sums/counts — O(partitions·m·ksub)
    scalar rows reach the driver, never vectors.  Codebook VALUES
    inherit float-sum partition-order sensitivity (~1e-15, standard for
    distributed k-means); downstream tests therefore pin recall floors
    and reconstruction-error bounds, not exact codebooks.  Empty cells
    keep their previous centroid."""
    import numpy as np
    import pandas as pd

    spark = embeddings.sparkSession
    seeds = (
        _vec_rows(embeddings, vec_col, id_col).orderBy("_id").limit(ksub).toPandas()
    )
    # Guard BEFORE np.stack: stacking an empty sequence dies with an opaque
    # numpy error, hiding the intended friendly message.
    if len(seeds) < ksub:
        raise ValueError(f"pq_train: corpus has {len(seeds)} rows < ksub={ksub}")
    S = np.stack(seeds["_v"].to_numpy()).astype(np.float64)
    dim = S.shape[1]
    if dim % m != 0:
        raise ValueError(f"pq_train: dim {dim} not divisible by m={m}")
    dsub = dim // m
    cb = np.ascontiguousarray(S.reshape(ksub, m, dsub).transpose(1, 0, 2))

    vecs = _vec_rows(embeddings, vec_col, id_col)
    for _ in range(iters):
        bc = spark.sparkContext.broadcast(cb)

        def partials(batches):
            C = bc.value
            sums = np.zeros((m, ksub, dsub))
            counts = np.zeros((m, ksub), dtype=np.int64)
            seen = False
            for b in batches:
                if not len(b):
                    continue
                seen = True
                X = (
                    np.stack(b["_v"].to_numpy())
                    .astype(np.float64)
                    .reshape(len(b), m, dsub)
                )
                for mm in range(m):
                    d = (C[mm] ** 2).sum(1)[None, :] - 2.0 * (X[:, mm, :] @ C[mm].T)
                    a = np.argmin(d, axis=1)
                    np.add.at(sums[mm], a, X[:, mm, :])
                    np.add.at(counts[mm], a, 1)
            if not seen:
                return
            yield pd.DataFrame(
                {
                    "m": np.repeat(np.arange(m), ksub),
                    "c": np.tile(np.arange(ksub), m),
                    "s": list(sums.reshape(m * ksub, dsub)),
                    "n": counts.reshape(m * ksub),
                }
            )

        rows = vecs.mapInPandas(
            partials, "m int, c int, s array<double>, n bigint"
        ).collect()
        new_sums = np.zeros((m, ksub, dsub))
        new_counts = np.zeros((m, ksub), dtype=np.int64)
        for r in rows:
            new_sums[r["m"], r["c"]] += np.asarray(r["s"])
            new_counts[r["m"], r["c"]] += r["n"]
        nonempty = new_counts > 0
        cb = cb.copy()
        cb[nonempty] = new_sums[nonempty] / new_counts[nonempty][:, None]
        bc.destroy()
    return cb


def pq_encode(
    embeddings: DataFrame,
    codebooks,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, codes array<int>) — each vector's per-subspace nearest
    codeword.  m bytes of logical payload per vector vs d floats: the
    compressed representation a 100 TB deployment PERSISTS as its
    vector index (the float corpus is only ever re-read to rescore).
    One Arrow pass, no shuffle."""
    import numpy as np
    import pandas as pd

    spark = embeddings.sparkSession
    m, ksub, dsub = codebooks.shape
    bc = spark.sparkContext.broadcast(np.ascontiguousarray(codebooks))

    def enc(batches):
        C = bc.value
        for b in batches:
            if not len(b):
                continue
            X = np.stack(b["_v"].to_numpy()).astype(np.float64).reshape(len(b), m, dsub)
            codes = np.empty((len(b), m), dtype=np.int32)
            for mm in range(m):
                d = (C[mm] ** 2).sum(1)[None, :] - 2.0 * (X[:, mm, :] @ C[mm].T)
                codes[:, mm] = np.argmin(d, axis=1)
            yield pd.DataFrame({"_id": b["_id"], "codes": list(codes)})

    return (
        _vec_rows(embeddings, vec_col, id_col)
        .mapInPandas(enc, "_id bigint, codes array<int>")
        .select(F.col("_id").alias(id_col), "codes")
    )


def pq_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    m: int = 8,
    ksub: int = 64,
    iters: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    codebooks=None,
) -> DataFrame:
    """PQ-ADC approximate top-k: rank every corpus vector by
    asymmetric-distance cosine against each query using only its
    m-byte PQ code —

        dot̂(q, x)  = Σ_m  LUT_m[code_m(x)],  LUT_m = q_m · C_mᵀ
        ‖x̂‖²       = Σ_m  ‖C_m[code_m(x)]‖²
        coŝ        = dot̂ / (‖q‖·‖x̂‖)

    The memory story quantized_topk starts, finished: int8 is 4× off
    float32; PQ at m=8, ksub=16 is d·4/m ≈ 32× with table-lookup
    scoring (the FAISS IVFADC recipe minus the coarse stage — compose
    with ``ivf_topk``'s cell probe for the full pipeline).  Search is
    one corpus pass, no shuffle, |Q|·k survivors per batch; LUTs are
    O(|Q|·m·ksub) driver floats, broadcast.  Accuracy is approximate
    BY DESIGN (code reconstruction error): recall floors vs brute
    force are pytest-pinned, and the two-stage exact-rescore follows
    the ``quantized_rescored_topk`` precedent."""
    import numpy as np
    import pandas as pd

    spark = embeddings.sparkSession
    cb = codebooks if codebooks is not None else pq_train(
        embeddings, m, ksub, iters, vec_col, id_col
    )
    m, ksub, dsub = cb.shape
    qids, qm = _collect_matrix(queries, vec_col, id_col)
    qn = np.linalg.norm(qm, axis=1)
    qsub = qm.reshape(len(qids), m, dsub)
    luts = np.stack([qsub[:, mm, :] @ cb[mm].T for mm in range(m)], axis=1)  # (|Q|, m, ksub)
    cnorm2 = (cb**2).sum(axis=2)  # (m, ksub)
    bc = spark.sparkContext.broadcast((qids, qn, luts, cnorm2, cb))

    def gen(batches):
        b_qids, b_qn, b_luts, b_cn2, C = bc.value
        for b in batches:
            if not len(b):
                continue
            ids = b["_id"].to_numpy(dtype=np.int64)
            X = np.stack(b["_v"].to_numpy()).astype(np.float64).reshape(len(b), m, dsub)
            codes = np.empty((len(b), m), dtype=np.int64)
            for mm in range(m):
                d = (C[mm] ** 2).sum(1)[None, :] - 2.0 * (X[:, mm, :] @ C[mm].T)
                codes[:, mm] = np.argmin(d, axis=1)
            # dot̂: gather each query's LUT at the batch codes, sum subspaces
            dot_hat = np.zeros((len(b_qids), len(ids)))
            n2 = np.zeros(len(ids))
            for mm in range(m):
                dot_hat += b_luts[:, mm, codes[:, mm]]
                n2 += b_cn2[mm, codes[:, mm]]
            norm_hat = np.sqrt(n2)
            norm_hat[norm_hat == 0.0] = 1.0
            cos_hat = dot_hat / (b_qn[:, None] * norm_hat[None, :])
            out = []
            for qi in range(len(b_qids)):
                mask = ids != b_qids[qi]
                cand_ids, cand = ids[mask], cos_hat[qi][mask]
                if not len(cand_ids):
                    continue
                order = np.lexsort((cand_ids, -cand))[:k]
                out.append(
                    pd.DataFrame(
                        {
                            "qid": np.full(len(order), b_qids[qi], dtype=np.int64),
                            "vid": cand_ids[order],
                            "cos": cand[order],
                        }
                    )
                )
            if out:
                yield pd.concat(out, ignore_index=True)

    partial = _vec_rows(embeddings, vec_col, id_col).mapInPandas(
        gen, "qid bigint, vid bigint, cos double"
    )
    return _topk_window(partial, k)


def pq_rescored_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    prefilter_k: int = 50,
    m: int = 8,
    ksub: int = 64,
    iters: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """The production PQ pipeline (FAISS ADC + refine): PQ-code
    prefilter (:func:`pq_topk`, top ``prefilter_k`` per query) followed
    by EXACT-cosine rescoring of only those candidates — identical
    two-stage shape to :func:`quantized_rescored_topk`, with PQ's ~32×
    compression on the scan stage.  Measured on the test corpus:
    raw ADC recall@5 ≈ 0.54, rescored ≈ 1.0 at prefilter 50 (floors
    pytest-pinned)."""
    cand = pq_topk(
        embeddings, queries, prefilter_k, m, ksub, iters, vec_col, id_col
    ).select("query_id", "neighbor_id")
    ev = _vec_rows(embeddings, vec_col, id_col)
    qv = _vec_rows(queries, vec_col, id_col)
    cos = cosine_pairs_udf()
    scored = (
        F.broadcast(cand)
        .join(qv.select(F.col("_id").alias("query_id"), F.col("_v").alias("_qv")), "query_id")
        .join(ev.select(F.col("_id").alias("neighbor_id"), F.col("_v").alias("_nv")), "neighbor_id")
        .select("query_id", "neighbor_id", cos(F.col("_qv"), F.col("_nv")).alias("cos"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.select(
            "query_id",
            "neighbor_id",
            F.row_number().over(w).cast("bigint").alias("rank"),
        )
        .where(F.col("rank") <= k)
    )


def ivfpq_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_lists: int = 16,
    n_probe: int = 4,
    refine_iters: int = 2,
    m: int = 8,
    ksub: int = 64,
    pq_iters: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Full IVFADC (Jégou et al. 2011; FAISS's `IVFx,PQy`): coarse
    inverted-file cells + RESIDUAL product quantization + asymmetric
    table-lookup scoring — the composition :func:`ivf_topk` and
    :func:`pq_topk` each document half of.  For cosine, the score of a
    vector with cell centroid c and residual code r̂ decomposes exactly:

        q·x̂   = q·c + Σ_m LUT_m[code_m]           (LUT_m = q_m·C_mᵀ)
        ‖x̂‖²  = ‖c‖² + 2·Σ_m XDOT[cell,m,code_m] + Σ_m ‖C_m[code_m]‖²

    where XDOT (the cell-centroid × codeword dot table, n_lists·m·ksub
    doubles) is corpus-independent and broadcast with the codebooks —
    nothing about the approximation is per-pair work.

    Why residuals: PQ codes the DIFFERENCE from the cell centroid, so
    codewords only span within-cell variation — reconstruction error
    (and recall) beats raw-vector PQ at equal bits, which is the whole
    reason FAISS quantizes residuals.  Measured here: raw-PQ rescored
    recall needed top-50 candidates; residual IVFADC reaches comparable
    recall probing 4/16 cells with top-k only (floors pytest-pinned).

    Plan shape: coarse centroids = lowest-id seeds + ``refine_iters``
    spherical-Lloyd passes (``ivf_topk``'s convention); residual
    codebooks train on a residual projection of the corpus (same
    partial-sum-only passes as :func:`pq_train`); search is ONE corpus
    pass — assign cell, code the residual, ADC-score against exactly
    the queries probing that cell — no shuffle, |Q|·k survivors per
    batch."""
    import numpy as np
    import pandas as pd

    from .clustering import _lloyd_update

    spark = embeddings.sparkSession
    vecs = _vec_rows(embeddings, vec_col, id_col)
    cents = vecs.orderBy("_id").limit(n_lists).toPandas()
    cm = np.stack(cents["_v"].to_numpy()).astype(np.float64)
    cm = cm / np.linalg.norm(cm, axis=1, keepdims=True)
    for _ in range(refine_iters):
        cm = _lloyd_update(vecs, cm, "_v")

    # residual projection: (id, rvec) with rvec = x - c[cell(x)]
    bc_cm = spark.sparkContext.broadcast(cm)

    def residuals(batches):
        C = bc_cm.value
        for b in batches:
            if not len(b):
                continue
            X = np.stack(b["_v"].to_numpy()).astype(np.float64)
            nrm = np.linalg.norm(X, axis=1, keepdims=True)
            nrm[nrm == 0.0] = 1.0
            cell = np.argmax((X / nrm) @ C.T, axis=1)
            R = X - C[cell]
            yield pd.DataFrame({"_id": b["_id"], "_v": list(R)})

    res = vecs.mapInPandas(residuals, "_id bigint, _v array<double>")
    cb = pq_train(res, m=m, ksub=ksub, iters=pq_iters, vec_col="_v", id_col="_id")
    _, ksub, dsub = cb.shape

    # corpus-independent broadcast tables
    cn2 = (cb**2).sum(axis=2)  # (m, ksub)
    xdot = np.stack(
        [cm.reshape(n_lists, m, dsub)[:, mm, :] @ cb[mm].T for mm in range(m)],
        axis=1,
    )  # (n_lists, m, ksub)
    cnorm2 = (cm**2).sum(axis=1)  # (n_lists,)

    qids, qm = _collect_matrix(queries, vec_col, id_col)
    qn = np.linalg.norm(qm, axis=1)
    qsub = qm.reshape(len(qids), m, dsub)
    luts = np.stack([qsub[:, mm, :] @ cb[mm].T for mm in range(m)], axis=1)  # (|Q|, m, ksub)
    qdotc = qm @ cm.T  # (|Q|, n_lists)
    # per-query probe cells (cosine order against unit centroids)
    cells_idx = np.arange(n_lists)
    probes = np.stack(
        [np.lexsort((cells_idx, -(qdotc[i] / qn[i])))[:n_probe] for i in range(len(qids))]
    )
    cell_to_q = {
        c: np.nonzero((probes == c).any(axis=1))[0] for c in range(n_lists)
    }
    bc = spark.sparkContext.broadcast(
        (qids, qn, luts, qdotc, cell_to_q, cm, cb, cn2, xdot, cnorm2)
    )

    def gen(batches):
        b_qids, b_qn, b_luts, b_qdotc, b_cq, C, CB, b_cn2, b_xdot, b_cnorm2 = bc.value
        for b in batches:
            if not len(b):
                continue
            ids = b["_id"].to_numpy(dtype=np.int64)
            X = np.stack(b["_v"].to_numpy()).astype(np.float64)
            nrm = np.linalg.norm(X, axis=1, keepdims=True)
            nrm[nrm == 0.0] = 1.0
            cell = np.argmax((X / nrm) @ C.T, axis=1)
            out = []
            for c in np.unique(cell):
                qidx = b_cq.get(int(c))
                if qidx is None or not len(qidx):
                    continue
                rows = np.nonzero(cell == c)[0]
                R = (X[rows] - C[c]).reshape(len(rows), m, dsub)
                codes = np.empty((len(rows), m), dtype=np.int64)
                for mm in range(m):
                    d = (CB[mm] ** 2).sum(1)[None, :] - 2.0 * (R[:, mm, :] @ CB[mm].T)
                    codes[:, mm] = np.argmin(d, axis=1)
                dot_r = np.zeros((len(qidx), len(rows)))
                n2 = np.full(len(rows), b_cnorm2[c])
                for mm in range(m):
                    dot_r += b_luts[qidx][:, mm, :][:, codes[:, mm]]
                    n2 += 2.0 * b_xdot[c, mm, codes[:, mm]] + b_cn2[mm, codes[:, mm]]
                norm_hat = np.sqrt(np.maximum(n2, 1e-12))
                cos_hat = (b_qdotc[qidx, c][:, None] + dot_r) / (
                    b_qn[qidx][:, None] * norm_hat[None, :]
                )
                for jj, qj in enumerate(qidx):
                    mask = ids[rows] != b_qids[qj]
                    cand_ids, cand = ids[rows][mask], cos_hat[jj][mask]
                    if not len(cand_ids):
                        continue
                    order = np.lexsort((cand_ids, -cand))[:k]
                    out.append(
                        pd.DataFrame(
                            {
                                "qid": np.full(len(order), b_qids[qj], dtype=np.int64),
                                "vid": cand_ids[order],
                                "cos": cand[order],
                            }
                        )
                    )
            if out:
                yield pd.concat(out, ignore_index=True)

    partial = vecs.mapInPandas(gen, "qid bigint, vid bigint, cos double")
    return _topk_window(partial, k)


def ivfpq_rescored_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    prefilter_k: int = 50,
    n_lists: int = 16,
    n_probe: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVFADC + exact refine — the complete FAISS-style production
    stack: coarse probe bounds the scanned fraction (n_probe/n_lists of
    the corpus), residual-PQ codes bound the scan's memory (~32× vs
    float32), exact cosine restores precision on the |Q|·prefilter_k
    survivors.  On the near-random test corpus (adversarial for IVF —
    no cluster structure) measured recall@5 ≈ 0.28 raw → ≈ 0.72-0.8
    rescored; floors pytest-pinned accordingly.  Structured corpora
    recover more: the probed cells then actually contain the
    neighbors."""
    cand = ivfpq_topk(
        embeddings, queries, prefilter_k, n_lists, n_probe,
        vec_col=vec_col, id_col=id_col,
    ).select("query_id", "neighbor_id")
    ev = _vec_rows(embeddings, vec_col, id_col)
    qv = _vec_rows(queries, vec_col, id_col)
    cos = cosine_pairs_udf()
    scored = (
        F.broadcast(cand)
        .join(qv.select(F.col("_id").alias("query_id"), F.col("_v").alias("_qv")), "query_id")
        .join(ev.select(F.col("_id").alias("neighbor_id"), F.col("_v").alias("_nv")), "neighbor_id")
        .select("query_id", "neighbor_id", cos(F.col("_qv"), F.col("_nv")).alias("cos"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.select(
            "query_id",
            "neighbor_id",
            F.row_number().over(w).cast("bigint").alias("rank"),
        )
        .where(F.col("rank") <= k)
    )


def maxsim_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_tokens: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Late-interaction (ColBERT-style) MaxSim top-k: each vector is
    viewed as ``n_tokens`` contiguous sub-token embeddings of
    dim/n_tokens each, and score(q, d) = sum_u max_t <q_u, d_t> — the
    retrieval scoring function of multi-vector models, where a query
    token matches its best document token instead of one pooled dot.

    Same 100 TB shape as :func:`brute_force_topk`: the query token
    tensor broadcasts, each Arrow batch runs ONE einsum against it
    ((batch, T, S) x (Q, T, S) -> per-pair token-similarity matrices),
    reduces max-over-doc-tokens / sum-over-query-tokens in the batch,
    and emits an exact per-query partial top-k under the final total
    order (score desc, vid asc) — candidates shrink to k per (batch,
    query) before any shuffle.  Output is ids + rank (float scores
    never leave the plan; MaxSim margins are O(1) vs ~1e-15 fold
    skew, the brute_force_topk discipline).
    """
    import numpy as np
    import pandas as pd

    spark = embeddings.sparkSession
    qids, qm = _collect_matrix(queries, vec_col, id_col)
    dim = qm.shape[1]
    assert dim % n_tokens == 0, f"dim {dim} not divisible by {n_tokens} tokens"
    sub = dim // n_tokens
    qt = qm.reshape(len(qids), n_tokens, sub)
    bc = spark.sparkContext.broadcast((qids, qt))

    def gen(batches):
        b_qids, b_qt = bc.value
        for batch in batches:
            if not len(batch):
                continue
            ids = batch["_id"].to_numpy(dtype=np.int64)
            m = np.stack(batch["_v"].to_numpy()).astype(np.float64)
            dt = m.reshape(len(ids), n_tokens, sub)
            # sims[d, q, u, t] = <query token u, doc token t>
            sims = np.einsum("qus,dts->dqut", b_qt, dt)
            scores = sims.max(axis=3).sum(axis=2)  # (d, q)
            out = []
            for j in range(len(b_qids)):
                col = scores[:, j]
                mask = ids != b_qids[j]
                cand_ids, cand = ids[mask], col[mask]
                if not len(cand_ids):
                    continue
                order = np.lexsort((cand_ids, -cand))[:k]
                out.append(
                    pd.DataFrame(
                        {
                            "qid": np.full(len(order), b_qids[j], dtype=np.int64),
                            "vid": cand_ids[order],
                            "cos": cand[order],
                        }
                    )
                )
            if out:
                yield pd.concat(out, ignore_index=True)

    partial = _vec_rows(embeddings, vec_col, id_col).mapInPandas(
        gen, "qid bigint, vid bigint, cos double"
    )
    return _topk_window(partial, k)
