#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Output contract (the driver captures only the LAST ~2,000 chars of
stdout — r06's single fat line outgrew that and the official bench
record was lost): stdout carries TWO JSON lines.  The first is the full
detail (4-dp per-query times + scale curve; also written to the
git-TRACKED BENCH_DETAIL.json so per-query numbers survive as a repo
artifact even when the compact line drops them); the LAST line is the
compact official record {"metric", "value", "unit", "sf", "n_queries"} plus the per-query
dict at 2 dp ONLY if the serialized line stays under _LINE_BUDGET chars
(tests/test_bench_contract.py pins the budget).

Each query is executed to a noop sink so the full plan runs without
driver-side transfer skewing the numbers.

Official-run MERGING (r13 VERDICT #2): a single sf0.1 run is one draw
from a noisy distribution — six near-identical r13 runs spanned
136-165 s under external load storms.  The committed headline is now
the per-query MIN over the round's official runs: each OFFICIAL run
(default SF at the official 32-core config — r14's 8-core scaling run
merged into and polluted the 32-core record, r14 VERDICT #1b)
merge-mins its per-query times into the existing BENCH_DETAIL.json
(same ``bench_epoch`` only), appends its own total to the ``runs``
array, and records per-query run counts.  A non-official run (any
other ``$SPARK_GRAFT_CPUS``) neither reads nor writes the record: its
one-line JSON reports THIS run's own times, which is exactly what a
scaling probe must measure.  ``BENCH_EPOCH`` must be bumped at round
open AND after any committed change that can alter a measured plan, so
a stale minimum can never mask a real regression; adding new headline
queries needs no bump (they enter with run count 1 and merge from
there).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from durablefunctions_mapreduce_dotnet_spark.queries import all_queries
from durablefunctions_mapreduce_dotnet_spark.session import get_spark

#: Merge epoch for official-run min-of-runs (see module docstring).
#: Bump at round open and after any plan-affecting change; the bench
#: contract test pins the committed BENCH_DETAIL.json to this value so
#: a round can't ship minima carried over from different code.
#: "r15b": bumped mid-round when the between-queries storage-pool
#: release landed — the first three r15 runs measured late-order
#: queries against ~120 queries' dead pins (times only HIGHER than
#: clean), so the record restarts rather than mixing methodologies.
BENCH_EPOCH = "r15b"

#: The official measurement configuration: the committed min-of-runs
#: record holds 32-core numbers ONLY.  A run at any other core count
#: (the driver's scaling probe sets SPARK_GRAFT_CPUS=8) must neither
#: read the record (it would re-print 32-core minima as its own) nor
#: write it (r14's 8-core run lowered committed 32-core minima —
#: VERDICT r14 #1b); it reports this run's own fresh times instead.
OFFICIAL_CPUS = 32


def bench_cpus() -> int:
    """Core count of this run — same derivation as session.get_spark."""
    return int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or min(os.cpu_count() or 4, 32)


def official_run(sf: str, cpus: int) -> bool:
    """True iff this run's config may read/write the committed
    min-of-runs record (BENCH_DETAIL.json)."""
    return sf == "0.1" and cpus == OFFICIAL_CPUS

#: headline set — extended as operators land
HEADLINE = [
    "flagship_faithful",
    "flagship_global",
    "flagship_csv_faithful",
    "pricing_summary",
    "join_inner_revenue",
    "window_rank_topk",
    "window_distribution",
    "join_asof",
    "sessionization",
    "dedup_exact",
    "dedup_minhash",
    "dedup_clusters",
    "ann_bruteforce_topk",
    "ann_ivf_topk",
    "kmeans_clusters",
    "dedup_embedding",
    "time_gapfill_interpolate",
    "join_range_binned",
    "text_stats",
    "curation_pack_sequences",
    "curation_vocab_topk",
    "curation_redact_pii",
    # round-4 additions
    "join_fuzzy_blocked",
    "window_concurrency",
    "window_concurrency_global",
    "funnel_steps",
    "cohort_retention",
    "window_scd2",
    "dedup_embedding_lsh",
    "text_tokens",
    "text_entropy",
    "time_gap_detect",
    "curation_quality_audit",
    "curation_histogram_equidepth",
    "cdc_apply",
    "join_asof_nearest",
    "graph_pagerank",
    "anomaly_mad",
    "text_lm_score",
    "text_entropy_fast",
    "text_lm_score_fast",
    "curation_temperature_mix",
    # round-6 additions
    "graph_triangles",
    "text_bpe_merges",
    "dedup_keep_best",
    "curation_dsir_weights",
    "curation_boilerplate_ngrams",
    "curation_pipeline_end2end",
    "ts_motif_topk",
    "text_bm25",
    "text_bpe_encode",
    "text_collocations",
    "dedup_containment",
    "dedup_semantic",
    "graph_label_propagation",
    # round-7 additions
    "curation_kanonymity",
    "graph_common_neighbors",
    "graph_kcore",
    "ts_holtwinters",
    "ann_pq_rescored",
    "sql_local_supplier_volume",
    "window_scd2_snapshot",
    "pattern_sequence",
    "text_feature_hashing",
    "curation_chunk_dedup",
    # round-8 additions (multimodal_phash_dedup re-admitted: the
    # radius-12 hamming join is multi-probe now — ~2 s at sf0.1 vs the
    # ~5 s that got it pulled in r07)
    "multimodal_phash_dedup",
    "multimodal_audio_energy",
    "ts_acf",
    "window_gaps_islands",
    "sql_large_orders",
    # round-9 additions: the completed TPC-H face's heavy shapes, the
    # RRF fusion (drives BM25 + brute-force ANN together), and the two
    # new audits
    "sql_forecast_revenue",
    "sql_waiting_suppliers",
    "sql_market_share",
    "ann_hybrid_rrf",
    "ts_changepoint",
    "dedup_cluster_sizes",
    "sql_product_profit",
    # round-10 additions: the exact twins that give the sketch/PCA/IVF
    # tiers in-registry ground truth, and the two crawl-pipeline ops
    "agg_kll_quantiles_exact",
    "embedding_pca2_exact",
    "ann_ivf_exhaustive",
    "curation_domain_cap",
    "curation_epoch_shuffle",
    "ts_ewma",
    "streaming_ewma",
    "sql_revenue_momentum",
    "audit_checksum_reconcile",
    "curation_forget_users",
    "agg_incremental_maintenance",
    "window_cumulative_uniques",
    # round-11 additions: the PQ/IVFADC exhaustive twins (full
    # codebook-train + rescore cost at brute-force coverage), the BMP
    # generate→decode→hash kernel, and the three-way HLL sketch pass
    "ann_pq_exhaustive",
    "ann_ivfpq_exhaustive",
    "multimodal_bmp_exact",
    "agg_hll_merge_invariance",
    "text_heavy_hitters",
    "agg_theta_set_algebra",
    # the WAV generate→RIFF-parse→frame-energy kernel (audio twin of
    # the BMP face); the motif query re-enters post-chain-rework via
    # its existing slot
    "multimodal_wav_exact",
    # snapshot write + mergeSchema evolved read + profile aggregate
    "curation_schema_evolution",
    # round-12 additions: the refined-IVF exhaustive twin (full Lloyd
    # refine + exhaustive probe cost), the contamination sweep (asym
    # bench x train inverted index), the frozen trigram classifier in
    # both formulations (explode+join vs single-pass Arrow — the bench
    # IS the comparison), and the URL canonicalization rollup
    "ann_ivf_refined_exhaustive",
    "curation_decontaminate",
    "text_langid_trigram",
    "text_langid_trigram_fast",
    "curation_url_normalize",
    # metadata-filtered vector search, MMR diversified re-rank, and the
    # incrementally-maintained near-dup clustering (its timing includes
    # rebuilding the prior state from scratch — see the query docstring)
    "ann_filtered",
    "ann_mmr_rerank",
    "dedup_clusters_incremental",
    # round-13 additions: incremental IVF maintenance (frozen-centroid
    # batch assignment + drift report; timing includes the prior-state
    # rebuild, same self-containment convention as dedup_clusters_
    # incremental); the FFD packer + its three-policy audit (the audit
    # runs all three packers, so it times the whole family)
    "ann_ivf_incremental",
    "curation_pack_bestfit",
    "curation_pack_policy_audit",
    # Gopher top-gram concentration (three n-gram count aggregates —
    # a new text kernel shape; ann_recall_audit stays untimed: it only
    # composes the two already-timed ANN kernels)
    "text_topgram_concentration",
    # split-then-pack: sequence-explode piece split + the bucketed FFD
    "curation_pack_split_bestfit",
    # round-14 addition: the RAG retrieve-side composite (chunk →
    # fingerprint dedup → embed-join → filtered top-20 → MMR-from-
    # candidates) — times the full funnel incl. the two scalar
    # materializations
    "ann_pipeline_end2end",
    "curation_zorder_layout",
    "join_bloom_prefilter",
    "linkage_entity_resolution",
    "graph_bfs_landmarks",
    "graph_sssp_weighted",
    "ann_maxsim_topk",
    "curation_mix_schedule",
    "multimodal_gif_exact",
    "text_vocab_growth",
    "ann_hard_negatives",
]


#: Why each non-headline query is out of the timed set (r10 VERDICT #6:
#: coverage audits shouldn't have to re-derive exclusions).  Rules are
#: matched in order; every excluded name MUST match one
#: (test_bench_contract enforces completeness).  No timing claims are
#: made for untimed queries — reasons cite the family representative or
#: the query's contract, both checkable in the registry.
_PULL_RULES: "list[tuple]" = [
    (
        lambda n: n.startswith("sql_"),
        "TPC-H raw-SQL face: light shape; the face's heavy members "
        "(sql_forecast_revenue, sql_market_share, sql_waiting_suppliers, "
        "sql_product_profit, sql_large_orders, sql_local_supplier_volume, "
        "sql_revenue_momentum) are timed in headline",
    ),
    (
        lambda n: n.startswith("streaming_"),
        "micro-batch harness: wall time is trigger/availableNow latency, "
        "not operator cost; streaming_ewma (custom stateful op) represents "
        "the family in headline",
    ),
    (
        lambda n: n
        in {
            "agg_approx_sketches",
            "agg_hll_incremental",
            "agg_kll_quantiles",
            "agg_theta_overlap",
        },
        "rows-only sketch estimator: single tiny aggregate, value checks "
        "carried by the exact twins (agg_kll_quantiles_exact in headline, "
        "agg_audience_overlap, agg_hll_merge_invariance)",
    ),
    (
        lambda n: n in {"dedup_simhash_portable", "agg_audience_overlap"},
        "exact twin of a rows-only query: exists for the driver's value "
        "hash; the underlying kernel's cost is timed via its family's "
        "headline entries",
    ),
    (
        lambda n: n.startswith("ann_") or n in {"embedding_covariance", "embedding_pca"},
        "ANN/embedding family: timed representatives are "
        "ann_bruteforce_topk, ann_ivf_topk, ann_ivf_exhaustive, "
        "ann_pq_rescored, ann_hybrid_rrf, embedding_pca2_exact, "
        "dedup_embedding(+_lsh), kmeans_clusters",
    ),
    (
        lambda n: n.startswith("dedup_"),
        "near-dup family: timed representatives are dedup_exact, "
        "dedup_minhash, dedup_clusters, dedup_cluster_sizes, "
        "dedup_containment, dedup_semantic, dedup_keep_best",
    ),
    (
        lambda n: n.startswith("multimodal_"),
        "multimodal metadata/geometry variant: the heavy kernels "
        "(multimodal_phash_dedup hamming join, multimodal_audio_energy "
        "framing) are timed in headline",
    ),
    (
        lambda n: n.startswith("curation_"),
        "curation family: timed representatives are the end2end pipeline, "
        "pack_sequences, vocab_topk, redact_pii, quality_audit, "
        "histogram_equidepth, dsir_weights, kanonymity, chunk_dedup, "
        "domain_cap, epoch_shuffle, temperature_mix, boilerplate_ngrams, "
        "forget_users",
    ),
    (
        lambda n: n.startswith("text_"),
        "text-analysis family: timed representatives are text_stats, "
        "text_tokens, text_entropy(+_fast), text_lm_score(+_fast), "
        "text_bm25, text_bpe_merges/encode, text_collocations, "
        "text_feature_hashing",
    ),
    (
        lambda n: n.startswith(("time_", "ts_")),
        "time-series family: timed representatives are "
        "time_gapfill_interpolate, time_gap_detect, ts_motif_topk, "
        "ts_holtwinters, ts_acf, ts_changepoint, ts_ewma, anomaly_mad",
    ),
    (
        lambda n: n.startswith(("udf_", "udaf_", "udtf_")),
        "UDF surface demo: exercises the pandas_udf/applyInPandas/UDTF "
        "API shape on small groups; kernel-heavy Arrow paths are timed "
        "via the dedup/text/ANN headline entries",
    ),
    (
        lambda n: True,
        "relational-core variant: single-shuffle shape on the small "
        "dimension tables; family represented in headline by the "
        "flagship trio, pricing_summary, join/window/sessionization "
        "entries (correctness: oracle mirror + driver window)",
    ),
]


def pulled_reason(name: str) -> str:
    for pred, reason in _PULL_RULES:
        if pred(name):
            return reason
    raise AssertionError(f"no pull rule matched {name}")  # pragma: no cover


def run_one(df) -> None:
    df.write.format("noop").mode("overwrite").save()
    # Release blocks persisted during query CONSTRUCTION (pagerank /
    # gap-fill / distribution-rank pin loop-invariant frames; their
    # pinned=[] release contract belongs to long-lived callers — which
    # this 48-query × 4-run session is).  Without this, ~hundreds of
    # orphaned MEMORY_AND_DISK frames accumulate over the run and the
    # later queries pay block-manager/GC pressure (dedup_clusters read
    # ~0.4-0.8 s slower in-bench than standalone before the purge).
    # Unpersisting AFTER the action is always safe: each rep's own
    # construction re-pins what it needs.
    spark = df.sparkSession
    for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
        rdd.unpersist()


#: scaling-shape probe: flagship + the slowest LLM/graph queries, timed
#: at sf0.1 AND a 10x replica (see _ensure_scale_dir) — the ratio column
#: is the check that no plan grows super-linearly in the data.
SCALE_PROBE = [
    "flagship_faithful",
    "dedup_clusters",
    "dedup_minhash",
    "time_gapfill_interpolate",
    "graph_pagerank",
    "text_lm_score",
    "text_entropy_fast",
    "text_lm_score_fast",
    "curation_pipeline_end2end",
    "graph_triangles",
    # r07: the chunked-window claim (~1.02x shuffle blowup) and the
    # shared minhash+CC core are the newest 100TB stories — pin their
    # 10x ratios.
    "ts_motif_topk",
    "dedup_keep_best",
    # r08: the peel-round (kcore) and wedge-explosion (common-neighbor
    # Jaccard) claims get measured curves (r07 VERDICT ask #6).
    "graph_kcore",
    "graph_common_neighbors",
]
SCALE_FACTOR = 10


def _ensure_scale_dir(repo_dir: str) -> str:
    """Build (once, cached, gitignored) a 10x-sf0.1 copy of the two
    tables the probe queries read.  No sf1.0 exists in /root/testdata,
    so the replica is derived from the driver's own sf0.1 parquet with
    per-replica ISOMORPHIC transforms that preserve workload shape:

    * events: ids offset, event_type suffixed per replica — 10x the
      series/groups, identical per-series length and time span.
    * documents: ids offset, text Caesar-rotated per replica — each
      replica's near-dup cluster structure is isomorphic to sf0.1's,
      while cross-replica shingle sets are disjoint.  (A naive text
      copy would make every doc a 10-way near-dup and the dedup
      workload quadratic BY CONSTRUCTION, which would measure the
      generator, not the engine.)
    """
    out = os.path.join(repo_dir, ".bench_scale", f"sf1.0_v3_x{SCALE_FACTOR}")
    ev, dc = os.path.join(out, "events.parquet"), os.path.join(out, "documents.parquet")
    li = os.path.join(out, "lineitem.parquet")
    if os.path.exists(ev) and os.path.exists(dc) and os.path.exists(li):
        return out
    import duckdb

    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    src = "/root/testdata/sf0.1"
    con.execute(
        f"""
        COPY (
          SELECT event_id + k * 1000000000 AS event_id,
                 ts,
                 user_id + k * 100000000 AS user_id,
                 CASE WHEN k = 0 THEN event_type
                      ELSE event_type || '_r' || k END AS event_type,
                 value, props
          FROM read_parquet('{src}/events.parquet'),
               range({SCALE_FACTOR}) t(k)
        ) TO '{ev}' (FORMAT PARQUET)
        """
    )
    alpha = "abcdefghijklmnopqrstuvwxyz"
    rot = " ".join(
        f"WHEN k = {k} THEN translate(text, '{alpha}', '{alpha[k:] + alpha[:k]}')"
        for k in range(1, SCALE_FACTOR)
    )
    con.execute(
        f"""
        COPY (
          SELECT doc_id + k * 100000000 AS doc_id,
                 CASE WHEN k = 0 THEN text {rot} END AS text,
                 lang, source, n_chars
          FROM read_parquet('{src}/documents.parquet'),
               range({SCALE_FACTOR}) t(k)
        ) TO '{dc}' (FORMAT PARQUET)
        """
    )
    # lineitem (graph_pagerank + graph_triangles): supplier/part/order
    # keys offset per replica → 10 disjoint ISOMORPHIC graph copies —
    # same degree distribution and component structure, no artificial
    # densification.  Only the three columns the probe queries read are
    # materialized (parquet is columnar; a full copy would only slow
    # generation).
    con.execute(
        f"""
        COPY (
          SELECT l_orderkey + k * 1000000000 AS l_orderkey,
                 l_suppkey + k * 10000000 AS l_suppkey,
                 l_partkey + k * 10000000 AS l_partkey
          FROM read_parquet('{src}/lineitem.parquet'),
               range({SCALE_FACTOR}) t(k)
        ) TO '{li}' (FORMAT PARQUET)
        """
    )
    con.close()
    return out


#: hard ceiling for the FINAL stdout line — the driver keeps only the
#: last 2,000 chars (measured exactly: every BENCH_r*.json tail is
#: len 2000), so the line + newline must fit with a little headroom.
#: r14 VERDICT #1a raised this from 1500: every char of headroom we
#: don't use is a per-query entry the driver doesn't get.
_LINE_BUDGET = 1900


def compact_result(result: dict) -> dict:
    """The official last-line record: totals always, plus as many
    per-query times (2 dp) as fit under ``_LINE_BUDGET``.

    r14 VERDICT #1a: the line used to drop the per-query dict entirely
    once the full dict outgrew the budget, so the driver's per-query
    comparison came back empty.  121 full query names can NEVER fit a
    2,000-char tail (~2.8k chars of names alone), so the line now fills
    its remaining budget SLOWEST-FIRST — the performance-relevant
    entries — and reports how many were omitted (``q_omitted``; the
    full dict always lives in the detail line + BENCH_DETAIL.json)."""
    compact = {
        "metric": result["metric"],
        "value": result["value"],
        "unit": result["unit"],
        "sf": result["sf"],
        "n_queries": result.get("n_queries", len(result.get("queries", {}))),
        "detail": "BENCH_DETAIL.json",
    }
    if "cpus" in result:
        compact["cpus"] = result["cpus"]
    if "this_run_total" in result:  # r14 VERDICT #1b: a scaling run's own total
        compact["this_run_total"] = result["this_run_total"]
    if "runs" in result:  # min-of-runs provenance: how many runs merged
        compact["runs"] = len(result["runs"])
    qs = result.get("queries", {}) or {}
    with_q = dict(compact)
    with_q["queries"] = {k: round(v, 2) for k, v in qs.items()}
    if len(json.dumps(with_q, separators=(",", ":"))) <= _LINE_BUDGET:
        return with_q
    # Greedy slowest-first fill; ties broken by name for determinism.
    chosen: dict[str, float] = {}
    for k, v in sorted(qs.items(), key=lambda kv: (-kv[1], kv[0])):
        trial = dict(compact)
        trial["q_omitted"] = len(qs)  # worst-case digit width
        trial["queries"] = dict(chosen)
        trial["queries"][k] = round(v, 2)
        if len(json.dumps(trial, separators=(",", ":"))) > _LINE_BUDGET:
            break
        chosen[k] = round(v, 2)
    compact["q_omitted"] = len(qs) - len(chosen)
    compact["queries"] = chosen
    return compact


def preflight() -> int:
    """Round-end bookkeeping gate (r09 VERDICT #4): simulate the next
    driver correctness window (the first 50 ``all_queries()`` rows —
    exactly what the external harness will hash) and run the two
    round-boundary tripwire tests against the ABOUT-TO-SHIP state, so a
    round can't end red on window pins or a stale BENCH_DETAIL.json.
    Run as the LAST action before the final commit of a round:

        python bench.py --preflight
    """
    import subprocess

    window = list(all_queries())[:50]
    print(f"next driver window ({len(window)} rows):")
    for i, n in enumerate(window):
        print(f"  {i:2d} {n}")
    rc = subprocess.call(
        [
            sys.executable,
            "-m",
            "pytest",
            "tests/test_window_contract.py",
            "tests/test_bench_contract.py",
            "-q",
        ],
        cwd=os.path.dirname(os.path.abspath(__file__)),
    )
    print("preflight:", "GREEN" if rc == 0 else "RED — fix before committing")
    return rc


def main() -> None:
    if "--preflight" in sys.argv[1:]:
        raise SystemExit(preflight())
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    cpus = bench_cpus()
    official = official_run(sf, cpus)
    # Host-state provenance (r11 VERDICT #8): sampled BEFORE the JVM
    # spins up, so the note reflects pre-existing contention, not our
    # own load.  Best-of-3 absorbs bursts but not a steadily busy host;
    # recording quiet-vs-contended per official run ends the
    # ratio-archaeology of re-measuring stale scale probes.  Override
    # with SPARK_GRAFT_HOST_NOTE for a manual annotation.
    la1, la5, _ = os.getloadavg()
    ncpu = os.cpu_count() or 1
    host_note = os.environ.get("SPARK_GRAFT_HOST_NOTE") or (
        f"{'quiet' if la5 < ncpu * 0.25 else 'contended'} host at start: "
        f"loadavg {la1:.1f}/{la5:.1f} (1/5 min) on {ncpu} cpus"
    )
    spark = get_spark("bench")
    qs = all_queries()
    names = [n for n in HEADLINE if n in qs]
    # Warmup (not timed): JVM/codegen via the first query, and the
    # Python/Arrow worker pool via a tiny pandas_udf job — otherwise the
    # first UDF-bearing query is charged ~seconds of worker spin-up.
    run_one(qs[names[0]](spark, sf_dir))
    # Higher-order-function expressions (transform/aggregate/slice) are
    # INTERPRETED; their evaluator classes need ~2 runs of C2 JIT before
    # steady state (measured: first dedup_minhash 16 s vs 3.3 s warm).
    # One executor-lifetime warm-up is exactly what a long-lived cluster
    # has; give the cold local JVM the same.
    spark.range(200_000).selectExpr(
        "aggregate(transform(sequence(0, 63), k -> (id + k) * 2654435761 % 2147483647),"
        " cast(0 as bigint), (acc, x) -> acc + x) AS s",
        "array_min(transform(slice(sequence(0, 63), 2, 60), x -> xxhash64(x, id))) AS m",
    ).write.format("noop").mode("overwrite").save()
    try:
        import pandas as pd  # noqa: F401
        from pyspark.sql.functions import col, pandas_udf

        def _noop(s):
            return s

        _noop.__annotations__ = {"s": pd.Series, "return": pd.Series}
        spark.range(1000).select(pandas_udf("bigint")(_noop)(col("id"))).write.format(
            "noop"
        ).mode("overwrite").save()
    except Exception:
        pass
    # Best-of-3 per query (r3+; r2 used best-of-2 — the only methodology
    # change, made because r2 showed 1.5-3.9x contention swings on
    # UNCHANGED code that two samples couldn't absorb): the host is a
    # shared VM with bursty CPU contention; the minimum is the faithful
    # cost of the plan.  Warmups above are frozen as of r2.
    times: dict[str, float] = {}
    # Per-query spread = (max - min) / min over the 3 samples (r12
    # VERDICT #2): the diagnostic that separates a real plan regression
    # (spread small, min moved) from host contention (spread large, min
    # stable).  A quiet host reads spreads mostly < 0.3; a loaded host
    # blows them past 1.0 while the min column stays comparable.
    spreads: dict[str, float] = {}
    # Storage-pool hygiene BETWEEN queries (r15 measurement-bug fix,
    # declared in OPTIMIZATION_r15.md): queries persist frames for the
    # duration of their own action (rounds, adjacencies, sign tables)
    # and the bench never released them, so by the ~100th HEADLINE
    # entry the pool held every prior query's dead pins and late
    # queries measured eviction churn, not their plan (bfs read ~5.8 s
    # in-bench vs ~4.2 standalone).  The release is UNTIMED and sits
    # between queries only — the three samples of one query still share
    # whatever they always shared, so per-query methodology is
    # unchanged from r14; cross-query interference is what goes.
    def _release_pins() -> None:
        for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
            rdd.unpersist()

    _release_pins()  # warmups pinned nothing we want to keep either
    for name in names:
        samples = []
        for _ in range(3):
            t0 = time.perf_counter()
            run_one(qs[name](spark, sf_dir))
            samples.append(time.perf_counter() - t0)
        best = min(samples)
        times[name] = round(best, 4)
        spreads[name] = round((max(samples) - best) / best, 3)
        _release_pins()
    # Min-of-runs merge (official sf0.1 @ 32-core runs only — see
    # module docstring): fold this run's per-query best-of-3 into the
    # prior BENCH_DETAIL.json minima when the merge epoch matches.  The
    # committed "value"/"queries" are then the round's per-query MIN
    # over all official runs — immune to one run catching a host load
    # storm — while "runs" keeps every run's own total for provenance
    # and "spread" stays THIS run's contention diagnostic.  A run at a
    # non-official core count skips the merge entirely and reports its
    # own fresh numbers (r14 VERDICT #1b).
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"
    )
    this_run_total = round(sum(times.values()), 4)
    merged: dict[str, float] = dict(times)
    runs_per_query: dict[str, int] = {n: 1 for n in times}
    runs: list[dict] = []
    if official:
        try:
            with open(detail_path) as fh:
                prior = json.loads(fh.read())
            if prior.get("bench_epoch") == BENCH_EPOCH:
                runs = list(prior.get("runs", []))
                pq, pc = prior.get("queries", {}), prior.get("runs_per_query", {})
                for n in merged:
                    if n in pq:
                        merged[n] = min(merged[n], pq[n])
                        runs_per_query[n] = pc.get(n, 1) + 1
        except (OSError, ValueError):
            pass
    runs.append(
        {
            "total": this_run_total,
            "host_note": host_note,
            "spread_median": round(
                sorted(spreads.values())[len(spreads) // 2], 3
            )
            if spreads
            else None,
        }
    )
    result = {
        "metric": "headline_queries_total",
        "value": round(sum(merged.values()), 4),
        "unit": "sec",
        "queries": merged,
        "sf": float(sf) if sf.replace(".", "", 1).isdigit() else sf,
        "n_queries": len(merged),
        "cpus": cpus,
        "this_run_total": this_run_total,
        "bench_epoch": BENCH_EPOCH,
        "runs": runs,
        "runs_per_query": runs_per_query,
        "host_note": host_note,
        "spread": spreads,
        "spread_median": round(sorted(spreads.values())[len(spreads) // 2], 3)
        if spreads
        else None,
        # No silent caps (r07 VERDICT #3): the detail record names what
        # was NOT measured.  HEADLINE is a representative cut — one per
        # operator family plus everything performance-interesting — not
        # the full registry; correctness of every registered query is
        # covered separately by the oracle mirror (tests/
        # test_oracle_parity.py) and the driver window.
        "coverage": {
            "headline": len(times),
            "registry": len(qs),
            "excluded": sorted(n for n in qs if n not in times),
            "pulled_with_reason": {
                n: pulled_reason(n) for n in sorted(qs) if n not in times
            },
        },
    }
    # Scale curve (only on the official sf0.1 @ 32-core run; skip for
    # quick dev loops at other SFs/core counts or with
    # SPARK_GRAFT_SCALE=0): best-of-3 at a 10x replica — the SAME
    # minimum-sampling as the sf0.1 numbers, or the ratio reads
    # biased-high by construction (asymmetric best-of-N put gapfill at
    # 10.1-10.4x where equal sampling shows ~10x).  Linear plans ride
    # ratio <= ~10; super-linear is a regression.
    if official and os.environ.get("SPARK_GRAFT_SCALE", "1") != "0":
        try:
            big_dir = _ensure_scale_dir(os.path.dirname(os.path.abspath(__file__)))
        except Exception as exc:  # generation failure must not kill bench
            print(f"scale probe skipped: {exc!r}", file=sys.stderr)
            big_dir = None
        if big_dir:
            curve: dict[str, dict[str, float]] = {}
            for name in SCALE_PROBE:
                _release_pins()  # same between-queries hygiene as sf0.1
                run_one(qs[name](spark, big_dir))  # warm (fresh file footers)
                best = float("inf")
                for _ in range(3):
                    t0 = time.perf_counter()
                    run_one(qs[name](spark, big_dir))
                    best = min(best, time.perf_counter() - t0)
                # ratio uses THIS run's sf0.1 best (same host window as
                # the sf1.0 samples), not the cross-run merged min — a
                # quiet-run min under a contended sf1.0 reading would
                # bias every ratio high by construction
                curve[name] = {
                    "sf0.1": times[name],
                    "sf1.0": round(best, 4),
                    "ratio": round(best / times[name], 2),
                }
            result["scale_curve"] = {"data_factor": SCALE_FACTOR, "queries": curve}
    # Detail record: full 4-dp times + scale curve — an EARLY stdout
    # line (survives in builder logs) and a git-TRACKED file; never the
    # last line, which must stay under the driver's tail capture.
    # Only the official run (sf0.1 at 32 cores) writes the file, so dev
    # loops at SPARK_GRAFT_SF_DIR=sf0.01 or the driver's 8-core scaling
    # probe can't clobber the committed per-query record.
    detail_line = json.dumps(result)
    print(detail_line)
    if official:
        try:
            with open(detail_path, "w") as fh:
                fh.write(detail_line + "\n")
        except OSError:
            pass
    # Quiesce and stop Spark BEFORE emitting the compact line: shutdown
    # spew (rejected-task stack traces, deleted shuffle temp files)
    # lands on the external driver's tail capture and can push the JSON
    # out of its ~2000-char window — exactly how the r08 record was
    # lost.  The compact line must be the process's last output.
    try:
        spark.sparkContext.cancelAllJobs()
    except Exception:
        pass
    try:
        spark.stop()
    except Exception:
        pass
    sys.stderr.flush()
    print(json.dumps(compact_result(result), separators=(",", ":")))
    sys.stdout.flush()


if __name__ == "__main__":
    main()
