"""The driver records only the LAST ~2,000 chars of bench.py stdout —
r06's official bench record was lost because the single JSON line grew
past that.  Pin the compact-last-line contract so it can't regress."""

import json

import bench


def _serialized(result: dict) -> str:
    return json.dumps(bench.compact_result(result), separators=(",", ":"))


def test_current_headline_set_fits_budget():
    """With every current headline query at a worst-case 3-digit time,
    the final line must stay within the driver's capture window (2,000
    chars, measured: every BENCH_r*.json tail is exactly that long) AND
    still carry a slowest-first per-query subset (r14 VERDICT #1a: the
    old all-or-nothing dict came back empty for 121 queries)."""
    result = {
        "metric": "headline_queries_total",
        "value": 12345.6789,
        "unit": "sec",
        "sf": 0.1,
        "cpus": 32,
        "this_run_total": 12999.9999,
        "n_queries": len(bench.HEADLINE),
        "queries": {name: 123.4567 for name in bench.HEADLINE},
    }
    line = _serialized(result)
    assert len(line) <= bench._LINE_BUDGET < 2000
    parsed = json.loads(line)
    assert parsed["metric"] == "headline_queries_total"
    assert parsed["value"] == 12345.6789
    assert parsed["n_queries"] == len(bench.HEADLINE)
    # r14 VERDICT #1b: the line carries this run's own total + config
    assert parsed["this_run_total"] == 12999.9999
    assert parsed["cpus"] == 32
    # per-query times: as many as fit, with the omission count declared
    assert parsed["queries"]
    assert len(parsed["queries"]) + parsed.get("q_omitted", 0) == len(bench.HEADLINE)
    assert all(n in bench.HEADLINE for n in parsed["queries"])


def test_oversized_query_dict_keeps_slowest_first_subset():
    """200 long-named queries cannot all fit: the compact record must
    keep the SLOWEST entries (the performance-relevant ones), declare
    how many were omitted, and still parse within budget."""
    qs = {f"very_long_query_name_number_{i:03d}": float(i) for i in range(200)}
    result = {
        "metric": "headline_queries_total",
        "value": 1.0,
        "unit": "sec",
        "sf": 0.1,
        "n_queries": 200,
        "queries": qs,
    }
    line = _serialized(result)
    assert len(line) <= bench._LINE_BUDGET
    parsed = json.loads(line)
    kept = parsed["queries"]
    assert kept and parsed["q_omitted"] == 200 - len(kept)
    # slowest-first: the kept set is exactly the top-len(kept) by time
    expect = sorted(qs, key=lambda k: (-qs[k], k))[: len(kept)]
    assert set(kept) == set(expect)
    assert parsed["n_queries"] == 200
    assert parsed["detail"] == "BENCH_DETAIL.json"


def test_official_run_gate_excludes_other_core_counts():
    """r14 VERDICT #1b: only the 32-core default-SF config may touch
    the committed min-of-runs record — the driver's 8-core scaling run
    must neither re-print the 32-core minima nor merge into them."""
    assert bench.official_run("0.1", 32)
    assert not bench.official_run("0.1", 8)
    assert not bench.official_run("0.01", 32)
    assert not bench.official_run("0.01", 8)


def test_scale_curve_never_reaches_final_line():
    """The scale curve belongs to the detail record only."""
    result = {
        "metric": "headline_queries_total",
        "value": 1.0,
        "unit": "sec",
        "sf": 0.1,
        "n_queries": 1,
        "queries": {"flagship_faithful": 0.5},
        "scale_curve": {"data_factor": 10, "queries": {}},
    }
    assert "scale_curve" not in bench.compact_result(result)


def test_detail_record_names_exclusions():
    """No silent bench caps (r07 VERDICT #3): the committed detail
    record must carry the coverage block naming every registry query
    NOT in the headline set, and the tracked BENCH_DETAIL.json must
    already have it."""
    from durablefunctions_mapreduce_dotnet_spark.queries import all_queries

    qs = all_queries()
    headline = [n for n in bench.HEADLINE if n in qs]
    # every headline name must resolve — a typo would silently shrink
    # the measured set
    assert headline == bench.HEADLINE
    with open("BENCH_DETAIL.json") as fh:
        detail = json.loads(fh.read())
    cov = detail["coverage"]
    assert cov["headline"] + len(cov["excluded"]) == cov["registry"]
    # r10 VERDICT #6: every exclusion carries its reason (and the live
    # rule table still covers every currently-excluded name)
    assert set(cov["pulled_with_reason"]) == set(cov["excluded"])
    assert all(cov["pulled_with_reason"].values())
    for name in (n for n in qs if n not in headline):
        assert bench.pulled_reason(name)
    # The committed record must be CURRENT, not just self-consistent:
    # r08 shipped a 67-query detail against a 188-query registry because
    # this test only checked internal arithmetic.  Any headline or
    # registry change now forces a regenerate+commit.
    assert cov["registry"] == len(qs), (
        f"BENCH_DETAIL.json is stale: records {cov['registry']} registry "
        f"queries but {len(qs)} are registered — regenerate with an "
        "official sf0.1 bench run and commit the refreshed file"
    )
    assert cov["headline"] == len(headline), (
        "BENCH_DETAIL.json headline count is stale — regenerate+commit"
    )
    # r11 VERDICT #8: every official run records the host state it ran
    # under (quiet vs contended), so scale-probe ratio archaeology has
    # provenance instead of guesswork
    assert detail.get("host_note"), (
        "BENCH_DETAIL.json lacks host_note — regenerate with the "
        "current bench.py (it samples loadavg before the JVM starts)"
    )
    # r12 VERDICT #2: the official record must carry per-query spread
    # ((max-min)/min over the 3 samples) alongside host_note, so a
    # contended run (large spreads, stable mins) is distinguishable from
    # a plan regression (small spreads, moved mins) without archaeology.
    spread = detail.get("spread")
    assert isinstance(spread, dict) and set(spread) == set(detail["queries"]), (
        "BENCH_DETAIL.json lacks per-query spread — regenerate with the "
        "current bench.py"
    )
    assert all(isinstance(v, (int, float)) and v >= 0 for v in spread.values())
    assert isinstance(detail.get("spread_median"), (int, float))


def test_committed_headline_is_min_of_runs():
    """r13 VERDICT #2: the committed official number must be the
    per-query min over the round's official runs, not one draw from a
    noisy host.  The detail record carries the merge epoch (pinned to
    bench.BENCH_EPOCH so stale minima can't ship), the per-run totals,
    and per-query run counts; the headline value must equal the sum of
    the per-query minima exactly."""
    with open("BENCH_DETAIL.json") as fh:
        detail = json.loads(fh.read())
    assert detail.get("bench_epoch") == bench.BENCH_EPOCH, (
        f"BENCH_DETAIL.json epoch {detail.get('bench_epoch')!r} != "
        f"bench.BENCH_EPOCH {bench.BENCH_EPOCH!r} — run an official "
        "sf0.1 bench to regenerate (round open bumps the epoch)"
    )
    runs = detail.get("runs")
    assert isinstance(runs, list) and runs, "no runs array in detail"
    for r in runs:
        assert isinstance(r.get("total"), (int, float)) and r["total"] > 0
        assert r.get("host_note")
    counts = detail.get("runs_per_query")
    assert isinstance(counts, dict) and set(counts) == set(detail["queries"])
    assert all(1 <= c <= len(runs) for c in counts.values())
    # the headline IS the min-of-runs: exact sum of the per-query minima
    assert detail["value"] == round(sum(detail["queries"].values()), 4)
    # compact line surfaces the run count
    compact = bench.compact_result(detail)
    assert compact["runs"] == len(runs)
