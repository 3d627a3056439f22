"""Hypothesis differential tests: randomized inputs vs independent
reference implementations (pandas merge_asof, a python sweep-line).

SURVEY.md §5.2.4 prescribes property tests beside the oracle mirror;
these target the operators whose edge cases are combinatorial —
duplicate timestamps, keys present on one side only, zero-length
intervals — where hand fixtures undercover.  Example counts are kept
small (Spark round-trip per example); derandomized so CI is stable.
"""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

_FUZZ = settings(
    max_examples=12,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

# (key, ts) pairs from tiny domains so duplicates and one-sided keys are
# FREQUENT, not rare
_rows = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 20)), min_size=0, max_size=25
)


@given(left=_rows, right=_rows)
@_FUZZ
def test_asof_backward_fuzz_vs_pandas(spark, left, right):
    from durablefunctions_mapreduce_dotnet_spark.operators.joins import (
        asof_join_backward,
    )

    lp = pd.DataFrame(
        {"id": range(len(left)), "k": [k for k, _ in left], "t": [float(t) for _, t in left]}
    )
    # unique (k, t) on the right so pandas' duplicate-pick rule (last
    # occurrence) can't diverge from our max-payload tie-break
    rp = (
        pd.DataFrame({"k": [k for k, _ in right], "t": [float(t) for _, t in right]})
        .drop_duplicates()
        .reset_index(drop=True)
    )
    rp["pay"] = rp["k"] * 100.0 + rp["t"]
    if len(lp) == 0 or len(rp) == 0:
        return
    exp = pd.merge_asof(
        lp.sort_values("t", kind="stable"),
        rp.sort_values("t", kind="stable").rename(columns={"t": "m"}),
        left_on="t", right_on="m", by="k", direction="backward",
    ).dropna(subset=["m"]).sort_values("id")
    l = spark.createDataFrame(lp).select("id", "k", F.timestamp_seconds("t").alias("ts"))
    r = spark.createDataFrame(rp).select("k", F.timestamp_seconds("t").alias("ts"), "pay")
    got = (
        asof_join_backward(l, r, key="k", payload={"pay": "pay"}, inner=True)
        .select("id", F.unix_timestamp("matched_ts").cast("double").alias("m"), "pay")
        .toPandas()
        .sort_values("id")
    )
    assert got["id"].tolist() == exp["id"].tolist()
    assert got["m"].tolist() == pytest.approx(exp["m"].tolist())
    assert got["pay"].tolist() == pytest.approx(exp["pay"].tolist())


@given(left=_rows, right=_rows)
@_FUZZ
def test_asof_nearest_fuzz_vs_pandas(spark, left, right):
    from durablefunctions_mapreduce_dotnet_spark.operators.joins import (
        asof_join_nearest,
    )

    lp = pd.DataFrame(
        {"id": range(len(left)), "k": [k for k, _ in left], "t": [float(t) for _, t in left]}
    )
    rp = (
        pd.DataFrame({"k": [k for k, _ in right], "t": [float(t) for _, t in right]})
        .drop_duplicates()
        .reset_index(drop=True)
    )
    if len(lp) == 0 or len(rp) == 0:
        return
    exp = pd.merge_asof(
        lp.sort_values("t", kind="stable"),
        rp.sort_values("t", kind="stable").rename(columns={"t": "m"}),
        left_on="t", right_on="m", by="k", direction="nearest",
    ).dropna(subset=["m"]).sort_values("id")
    l = spark.createDataFrame(lp).select("id", "k", F.timestamp_seconds("t").alias("ts"))
    r = spark.createDataFrame(rp).select("k", F.timestamp_seconds("t").alias("ts"))
    got = (
        asof_join_nearest(l, r, key="k", inner=True)
        .select("id", F.unix_timestamp("matched_ts").cast("double").alias("m"))
        .toPandas()
        .sort_values("id")
    )
    assert got["id"].tolist() == exp["id"].tolist()
    assert got["m"].tolist() == pytest.approx(exp["m"].tolist())


@given(
    iv=st.lists(
        st.tuples(st.integers(0, 15), st.integers(0, 10)), min_size=1, max_size=30
    )
)
@_FUZZ
def test_concurrency_fuzz_vs_python_sweep(spark, iv):
    """Random intervals (INCLUDING zero-length: start == end nets to
    nothing under half-open semantics) vs an independent python sweep."""
    from collections import Counter

    from durablefunctions_mapreduce_dotnet_spark.operators.analytics import (
        interval_concurrency,
    )

    rows = [("k", s, s + d) for s, d in iv]
    df = spark.createDataFrame(rows, "part string, s long, e long")
    got = interval_concurrency(df, "part", F.col("s"), F.col("e")).collect()

    net = Counter()
    for _, s, e in rows:
        net[s] += 1
        net[e] -= 1
    acc, best, best_t = 0, None, None
    for t in sorted(net):
        acc += net[t]
        if best is None or acc > best:
            best, best_t = acc, t
    assert len(got) == 1
    assert got[0].peak_concurrency == best and got[0].peak_at_us == best_t


_changes = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 12), st.sampled_from(["a", "b", None])),
    min_size=1,
    max_size=20,
)


@given(rows=_changes)
@_FUZZ
def test_scd2_fuzz_vs_python_reference(spark, rows):
    """SCD2 vs a direct python replay: per key, ordered by (ts, id),
    collapse repeats (NULL-safe), close each interval with the next
    change, leave the last open."""
    from durablefunctions_mapreduce_dotnet_spark.operators.analytics import scd2_intervals

    data = [(k, t, i, v) for i, (k, t, v) in enumerate(rows)]
    df = spark.createDataFrame(data, "k long, t long, id long, v string").select(
        "k", F.timestamp_seconds("t").alias("ts"), "id", "v"
    )
    got = sorted(
        (
            (r.k, r.v, r.f, r.to)
            for r in scd2_intervals(df, "k", "ts", "v", "id")
            .select("k", "v", F.unix_timestamp("valid_from").alias("f"),
                    F.unix_timestamp("valid_to").alias("to"))
            .collect()
        ),
        key=repr,  # None-bearing tuples don't order natively
    )
    exp = []
    bykey: dict = {}
    for k, t, i, v in sorted(data, key=lambda r: (r[0], r[1], r[2])):
        bykey.setdefault(k, []).append((t, v))
    for k, seq in bykey.items():
        surv = []
        for t, v in seq:
            if not surv or surv[-1][1] != v:
                surv.append((t, v))
        for j, (t, v) in enumerate(surv):
            to = surv[j + 1][0] if j + 1 < len(surv) else None
            exp.append((k, v, t, to))
    assert got == sorted(exp, key=repr)


@given(rows=_changes)
@_FUZZ
def test_cdc_apply_fuzz_vs_python_reference(spark, rows):
    from durablefunctions_mapreduce_dotnet_spark.operators.analytics import cdc_apply

    ops = ["I", "U", "D"]
    data = [(k, t, i, ops[i % 3], float(t)) for i, (k, t, _) in enumerate(rows)]
    df = spark.createDataFrame(
        data, "k long, t long, id long, op string, v double"
    ).select("k", F.timestamp_seconds("t").alias("ts"), "id", "op", "v")
    got = sorted((r.k, r.v) for r in cdc_apply(df, "k", "ts", "id", payload_cols=["v"]).collect())
    last: dict = {}
    for k, t, i, op, v in sorted(data, key=lambda r: (r[0], r[1], r[2])):
        last[k] = (op, v)
    exp = sorted((k, v) for k, (op, v) in last.items() if op != "D")
    assert got == exp


# --- chunking ---------------------------------------------------------------

_texts = st.lists(
    st.text(
        alphabet=st.sampled_from(list("ab \n.é9")),
        min_size=0,
        max_size=120,
    ),
    min_size=1,
    max_size=6,
)


@given(
    texts=_texts,
    chunk=st.integers(2, 40),
    overlap_frac=st.floats(0.0, 0.99),
)
@_FUZZ
def test_chunk_documents_fuzz_covers_and_reconstructs(
    spark, texts, chunk, overlap_frac
):
    """For ANY (chunk, overlap) and any texts: every chunk i is exactly
    text[i*stride : i*stride+chunk] (the spec, via Python slicing), and
    stitching chunk0 + suffixes-after-overlap reconstructs each doc —
    every character covered exactly once net of overlaps."""
    from durablefunctions_mapreduce_dotnet_spark.operators.curation import (
        chunk_documents,
    )

    overlap = min(int(chunk * overlap_frac), chunk - 1)
    stride = chunk - overlap
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )
    got = {}
    for r in chunk_documents(df, chunk, overlap).collect():
        got.setdefault(r.doc_id, {})[r.chunk_idx] = r.chunk_text
    for i, t in enumerate(texts):
        chunks = got.get(i, {})
        if len(t) == 0:
            assert chunks == {}
            continue
        assert sorted(chunks) == list(range(len(chunks)))
        for idx, ct in chunks.items():
            assert ct == t[idx * stride : idx * stride + chunk]
        rebuilt = chunks[0] + "".join(
            chunks[j][overlap:] for j in range(1, len(chunks))
        )
        assert rebuilt == t
        # ceil coverage without a pure-overlap trailing chunk
        last = max(chunks)
        assert last * stride + chunk >= len(t)
        assert last == 0 or last * stride + overlap < len(t)


@given(
    texts=_texts,
    chunk=st.integers(2, 30),
    overlap_frac=st.floats(0.0, 0.99),
)
@_FUZZ
def test_chunk_documents_tokens_fuzz_reconstructs(
    spark, texts, chunk, overlap_frac
):
    """Token-budget chunking: against the doc's actual token array
    (same JVM regex, fetched once), every chunk must equal the joined
    token slice [i*stride, i*stride+chunk) and stitching minus overlaps
    must reconstruct the text byte-for-byte."""
    from durablefunctions_mapreduce_dotnet_spark.operators.curation import (
        chunk_documents_tokens,
    )
    from durablefunctions_mapreduce_dotnet_spark.operators.textops import (
        BPE_ISH_RE,
    )

    overlap = min(int(chunk * overlap_frac), chunk - 1)
    stride = chunk - overlap
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )
    toks = {
        r.doc_id: r.t
        for r in df.select(
            "doc_id",
            F.regexp_extract_all(F.col("text"), F.lit(BPE_ISH_RE), F.lit(0)).alias("t"),
        ).collect()
    }
    got = {}
    for r in chunk_documents_tokens(df, chunk, overlap).collect():
        got.setdefault(r.doc_id, {})[r.chunk_idx] = (r.chunk_text, r.n_tokens)
    for i, t in enumerate(texts):
        tk = toks[i]
        chunks = got.get(i, {})
        if len(tk) == 0:
            assert chunks == {}
            continue
        assert sorted(chunks) == list(range(len(chunks)))
        for idx, (ct, n) in chunks.items():
            sl = tk[idx * stride : idx * stride + chunk]
            assert ct == "".join(sl) and n == len(sl)
        rebuilt = chunks[0][0] + "".join(
            "".join(tk[j * stride + overlap : j * stride + chunk])
            for j in range(1, len(chunks))
        )
        assert rebuilt == "".join(tk)


# --- triangle counting ------------------------------------------------------

_edges = st.lists(
    st.tuples(st.integers(0, 9), st.integers(0, 9)), min_size=0, max_size=40
)


@given(edges=_edges)
@_FUZZ
def test_triangle_counts_fuzz_vs_bruteforce(spark, edges):
    """Degree-ordered wedge closing vs an O(n^3) Python reference on
    random small multigraphs — duplicates, reverse edges, self-loops,
    and degree ties (the orientation tie-break) occur constantly on a
    10-node domain."""
    from durablefunctions_mapreduce_dotnet_spark.operators.graph import (
        triangle_counts,
    )

    und = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    nodes = {n for e in und for n in e}
    expected = {}
    for a in sorted(nodes):
        for b in sorted(nodes):
            if b <= a or (a, b) not in und:
                continue
            for c in sorted(nodes):
                if c <= b or (b, c) not in und or (a, c) not in und:
                    continue
                for n in (a, b, c):
                    expected[n] = expected.get(n, 0) + 1
    if not edges:
        return
    got = {
        r["n"]: r["n_triangles"]
        for r in triangle_counts(
            spark.createDataFrame(edges, "id_a bigint, id_b bigint")
        ).collect()
    }
    assert got == expected


# --- BPE merge learning -----------------------------------------------------

_corpus = st.lists(
    st.text(alphabet=st.sampled_from(list("abc x")), min_size=0, max_size=30),
    min_size=1,
    max_size=5,
)


@given(texts=_corpus, n_merges=st.integers(1, 5))
@_FUZZ
def test_bpe_merges_fuzz_vs_python_reference(spark, texts, n_merges):
    """learn_bpe_merges vs the pure-Python replace-BPE on random tiny
    corpora — repeated-symbol runs and ties (tiny alphabet) hammer the
    replace-semantics edge cases and the (cnt DESC, pair ASC) argmax."""
    from durablefunctions_mapreduce_dotnet_spark.operators.textops import (
        learn_bpe_merges,
    )

    def ref_bpe(docs, n):
        freq = {}
        for t in docs:
            for w in t.lower().split(" "):
                if w:
                    freq[w] = freq.get(w, 0) + 1
        vocab = {" " + " ".join(w) + " ": c for w, c in freq.items()}
        out = []
        for rank in range(1, n + 1):
            pairs = {}
            for sym, c in vocab.items():
                s = sym.strip().split(" ")
                for i in range(len(s) - 1):
                    key = s[i] + " " + s[i + 1]
                    pairs[key] = pairs.get(key, 0) + c
            if not pairs:
                break
            best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
            out.append((rank, best[0], best[1]))
            a, b = best[0].split(" ")
            vocab2 = {}
            for sym, c in vocab.items():
                k2 = sym.replace(f" {a} {b} ", f" {a}{b} ")
                vocab2[k2] = vocab2.get(k2, 0) + c
            vocab = vocab2
        return out

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )
    got = [
        (r["rank"], r["pair"], r["freq"])
        for r in learn_bpe_merges(df, n_merges=n_merges).orderBy("rank").collect()
    ]
    assert got == ref_bpe(texts, n_merges)


_ids = st.lists(
    st.integers(0, 10_000), min_size=1, max_size=40, unique=True
)


@given(ids=_ids)
@_FUZZ
def test_epoch_shuffle_fuzz_is_permutation(spark, ids):
    """epoch_shuffle must be a PERMUTATION partitioned into shards: every
    input id appears exactly once, each shard's positions are the
    contiguous 1..n_shard run, and the shard assignment is the
    documented hash — for ANY id set.  Different epochs reorder (checked
    only when the two keys actually order differently)."""
    from durablefunctions_mapreduce_dotnet_spark.operators.curation import (
        epoch_shuffle,
    )

    df = spark.createDataFrame([(i,) for i in ids], "doc_id bigint")
    out = epoch_shuffle(df, n_shards=4, epoch=1).toPandas()
    assert sorted(out.doc_id) == sorted(ids)
    for _, g in out.groupby("shard"):
        assert sorted(g.position) == list(range(1, len(g) + 1))
    knuth, m32 = 2654435761, 4294967296
    for r in out.itertuples():
        key = ((r.doc_id + 1_000_003) * knuth) % m32
        assert r.shard == key % 4


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 3), st.integers(0, 100)),
        min_size=1,
        max_size=40,
    )
)
@_FUZZ
def test_domain_cap_fuzz_vs_python_reference(spark, rows):
    """domain_cap vs a from-scratch python reference: per domain keep the
    cap best rows by (order desc, id asc) — duplicates in the order
    column are FREQUENT here, so the deterministic tie-break is what is
    actually under test."""
    from durablefunctions_mapreduce_dotnet_spark.operators.curation import (
        domain_cap,
    )

    # unique ids: (domain, order) pairs repeat, ids never do
    data = [
        (i, f"d{dom}", order) for i, (dom, _, order) in enumerate(rows)
    ]
    df = spark.createDataFrame(data, "doc_id bigint, source string, n_chars bigint")
    got = {
        (r.source, r.doc_id): r.domain_rank
        for r in domain_cap(df, cap=3).collect()
    }
    expect = {}
    bydom: dict[str, list] = {}
    for i, dom, order in data:
        bydom.setdefault(dom, []).append((-order, i))
    for dom, lst in bydom.items():
        for rank, (_, i) in enumerate(sorted(lst)[:3], start=1):
            expect[(dom, i)] = rank
    assert got == expect


_doclens = st.lists(st.integers(1, 40), min_size=1, max_size=18)


@given(lens=_doclens, budget=st.integers(4, 30))
@_FUZZ
def test_pack_bestfit_fuzz_vs_python_reference(spark, lens, budget):
    """FFD assignments must equal a from-scratch python first-fit-
    decreasing over the same (len DESC, id) order — including the
    oversize-singleton rule — and every non-oversize pack must fit."""
    from durablefunctions_mapreduce_dotnet_spark.operators.curation import (
        pack_bestfit,
    )

    rows = [(i, "s", " ".join(["w"] * n)) for i, n in enumerate(lens)]
    d = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {
        r.doc_id: r.pack
        for r in pack_bestfit(d, budget_tokens=budget, n_buckets=1).collect()
    }
    order = sorted(range(len(lens)), key=lambda i: (-lens[i], i))
    rem: list[int] = []
    exp = {}
    for i in order:
        for j, r in enumerate(rem):
            if r >= lens[i]:
                rem[j] = r - lens[i]
                exp[i] = j + 1
                break
        else:
            rem.append(budget - lens[i])
            exp[i] = len(rem)
    assert got == exp
    sums: dict[int, int] = {}
    for i, p in got.items():
        sums[p] = sums.get(p, 0) + lens[i]
    for p, tot in sums.items():
        members = [i for i in got if got[i] == p]
        if all(lens[i] <= budget for i in members):
            assert tot <= budget


@given(lens=_doclens, budget=st.integers(4, 30))
@_FUZZ
def test_split_pack_fuzz_conserves_and_never_overflows(spark, lens, budget):
    """split-then-pack invariants under random lengths/budgets: piece
    tokens per doc sum to the doc length with contiguous piece_idx,
    every piece <= budget, and NO pack ever exceeds the budget (the
    policy's zero-overflow guarantee at any budget)."""
    import collections

    from durablefunctions_mapreduce_dotnet_spark.operators.curation import (
        split_pack_bestfit,
    )

    rows = [(i, "s", " ".join(["w"] * n)) for i, n in enumerate(lens)]
    d = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = split_pack_bestfit(d, budget_tokens=budget, n_buckets=2).collect()
    per_doc = collections.defaultdict(list)
    pack_tot = collections.Counter()
    for r in got:
        per_doc[r.doc_id].append((r.piece_idx, r.n_tokens))
        pack_tot[(r.bucket, r.pack)] += r.n_tokens
        assert r.n_tokens <= budget
    for i, n in enumerate(lens):
        pieces = sorted(per_doc[i])
        assert [p for p, _ in pieces] == list(range(len(pieces)))
        assert sum(t for _, t in pieces) == n
    assert not pack_tot or max(pack_tot.values()) <= budget


@given(
    docs=st.lists(
        st.lists(st.sampled_from(["a", "b", "c", "dd"]), min_size=1, max_size=15),
        min_size=1,
        max_size=8,
    )
)
@_FUZZ
def test_gram_concentration_fuzz_vs_python_counter(spark, docs):
    """Topgram signals vs a from-scratch Counter reference on tiny
    vocabularies (ties and repeats frequent by construction)."""
    import collections

    from durablefunctions_mapreduce_dotnet_spark.operators.textops import (
        gram_concentration,
    )

    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in gram_concentration(d).collect()}
    for i, toks in enumerate(docs):
        n = len(toks)
        r = got[i]
        assert r.n_tokens == n
        assert r.max_word_frac == max(collections.Counter(toks).values()) / n
        if n >= 2:
            bigs = collections.Counter(
                " ".join(toks[j : j + 2]) for j in range(n - 1)
            )
            assert r.top_bigram_frac == 2 * max(bigs.values()) / n
        else:
            assert r.top_bigram_frac is None
        if n >= 3:
            tris = collections.Counter(
                " ".join(toks[j : j + 3]) for j in range(n - 2)
            )
            dup = sum(c for c in tris.values() if c >= 2)
            assert r.dup_trigram_frac == dup / (n - 2)
        else:
            assert r.dup_trigram_frac is None


@given(
    lens=st.lists(st.integers(0, 400), min_size=0, max_size=250),
    budget=st.integers(1, 300),
)
@settings(max_examples=150, deadline=None, derandomize=True)
def test_firstfit_tree_fuzz_vs_linear_scan(lens, budget):
    """The segment-tree first-fit (r13 VERDICT #5) must place every
    item in EXACTLY the pack the O(n x open_packs) linear scan would —
    including oversize items whose remainder goes negative and
    zero-length items that ride the first non-negative open pack.
    Pure-python differential, no Spark round-trip, so examples can be
    an order of magnitude larger than the end-to-end FFD fuzz."""
    from durablefunctions_mapreduce_dotnet_spark.operators.curation import (
        _FirstFit,
    )

    fit = _FirstFit(len(lens))
    rem: list[int] = []
    for need in lens:
        for i, r in enumerate(rem):
            if r >= need:
                rem[i] = r - need
                exp = i + 1
                break
        else:
            rem.append(budget - need)
            exp = len(rem)
        assert fit.place(need, budget) == exp


def test_firstfit_tree_pathological_bucket_stays_loglinear():
    """The case that sent the linear scan quadratic: every item just
    over half the budget, so each opens a new pack and the scan walks
    ALL open packs per item — 200k items would be ~2e10 comparisons.
    The tree does it in O(n log n); this completes in well under a
    second or the regression is obvious in CI wall time."""
    from durablefunctions_mapreduce_dotnet_spark.operators.curation import (
        _FirstFit,
    )

    n, budget = 200_000, 1024
    fit = _FirstFit(n)
    for j in range(n):
        assert fit.place(513, budget) == j + 1
    assert fit.n_open == n


@given(
    counts=st.lists(st.integers(1, 40), min_size=1, max_size=5),
    n_steps=st.integers(1, 60),
)
@_FUZZ
def test_stride_schedule_fuzz_vs_python_reference(spark, counts, n_steps):
    """Differential + invariant for the stride scheduler: the Spark
    pipeline must equal a from-scratch python sort of the same virtual
    times, and the emitted prefix counts must satisfy the stride bound
    |cum_i(n) - n*share_i| <= 1 for EVERY prefix and source — with
    arbitrary weights, not just the documents corpus shares."""
    from durablefunctions_mapreduce_dotnet_spark.operators.curation import (
        stride_schedule,
    )

    cdf = spark.createDataFrame(
        [(f"s{i}", c) for i, c in enumerate(counts)], "lang string, cnt long"
    )
    got = [
        (r.step, r.lang, r.k)
        for r in stride_schedule(cdf, n_steps).orderBy("step").collect()
    ]
    # reference: enumerate candidate times, sort by (t, key), take n
    cand = sorted(
        ((2 * k + 1) / (2 * c), f"s{i}", k)
        for i, c in enumerate(counts)
        for k in range(n_steps)
    )[:n_steps]
    want = [(s + 1, key, k) for s, (_, key, k) in enumerate(cand)]
    assert got == want
    total = sum(counts)
    cum = {f"s{i}": 0 for i in range(len(counts))}
    for step, key, _ in got:
        cum[key] += 1
        for i, c in enumerate(counts):
            assert abs(cum[f"s{i}"] - step * c / total) <= 1.0 + 1e-9
