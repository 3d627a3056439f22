"""Hand-computed semantics for operators.timeseries.gap_fill (the SQL
oracle locks cross-engine parity; this locks the intended math on a
frame small enough to eyeball)."""

from __future__ import annotations

import datetime as dt

from durablefunctions_mapreduce_dotnet_spark.operators.timeseries import gap_fill


def _ts(minute: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, minute)


def test_gap_fill_locf_and_linear_on_interior_gaps(spark):
    rows = [
        # series a: observations in minutes 0 and 3 -> gap buckets 1, 2
        ("a", _ts(0), 1, 10.0),
        ("a", _ts(3), 2, 40.0),
        # series b: two obs in ONE bucket -> later (ts, id) wins; no gaps
        ("b", _ts(0), 3, 5.0),
        ("b", _ts(0), 4, 7.0),
    ]
    df = spark.createDataFrame(rows, "event_type string, ts timestamp, event_id long, value double")
    out = {
        (r["series"], r["bucket"]): r
        for r in gap_fill(df, "event_type", "ts", "value", step_seconds=60).collect()
    }
    base = int(dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc).timestamp())

    a0, a1, a2, a3 = (out[("a", base + 60 * i)] for i in range(4))
    assert (a0["v_obs"], a0["v_locf"], a0["v_lin"]) == (10.0, 10.0, 10.0)
    assert a1["v_obs"] is None and a1["v_locf"] == 10.0 and a1["v_lin"] == 20.0
    assert a2["v_obs"] is None and a2["v_locf"] == 10.0 and a2["v_lin"] == 30.0
    assert (a3["v_obs"], a3["v_locf"], a3["v_lin"]) == (40.0, 40.0, 40.0)

    assert set(k for k in out if k[0] == "b") == {("b", base)}
    assert out[("b", base)]["v_obs"] == 7.0  # (ts, id)-max representative