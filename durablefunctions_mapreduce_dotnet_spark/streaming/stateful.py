"""Custom stateful streaming operators (``applyInPandasWithState``).

The reference's durable orchestration keeps per-instance state in Azure
Storage and survives restarts by replay (``README.md:40``,
``Sample.cs:52``); the Spark analogue for *data-plane* state is the
state store behind ``applyInPandasWithState`` — per-key state,
checkpointed, with Arrow-batched user code.

``first_seen_stateful`` is streaming first-touch attribution /
online exact dedup: for every key, the earliest event wins, no matter
how many micro-batches the input arrives in.  State is one (ts, id)
pair per key — O(|keys|), not O(|events|) — and with a TTL/timeout it
becomes bounded sliding dedup.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def first_seen_stateful(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Earliest event per key across all micro-batches (ties broken by
    id).  Emits the key's current winner whenever a batch improves it,
    so the per-key LAST emission is the final answer — with a single
    batch (file source, all files in trigger one) there is exactly one
    emission per key and the output is directly the answer."""

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        best_ts, best_id = state.get if state.exists else (None, None)
        improved = False
        for pdf in pdfs:
            # NULL timestamps can never be "first": admitting one would
            # set state to (NaT, id), and NaT comparisons are always
            # False, so no real timestamp could ever displace it.
            pdf = pdf[pdf[ts_col].notna()]
            if not len(pdf):
                continue
            pdf = pdf.sort_values([ts_col, id_col])
            ts, eid = pdf.iloc[0][ts_col], int(pdf.iloc[0][id_col])
            if best_ts is None or (ts, eid) < (best_ts, best_id):
                best_ts, best_id, improved = ts, eid, True
        if improved:
            state.update((best_ts, best_id))
            yield pd.DataFrame(
                {
                    key_col: [key[0]],
                    "first_ts": [best_ts],
                    "first_event_id": [best_id],
                }
            )

    # schemas derived from the input so non-default key/ts/id column
    # types keep the declared Arrow structs truthful
    dt = dict(events.dtypes)
    return events.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=(
            f"{key_col} {dt[key_col]}, first_ts {dt[ts_col]},"
            f" first_event_id {dt[id_col]}"
        ),
        stateStructType=f"first_ts {dt[ts_col]}, first_event_id {dt[id_col]}",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def running_extrema_stateful(
    events: DataFrame,
    key_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Per-key running MAX + row count via ``transformWithStateInPandas``
    — Spark 4's arbitrary-stateful API (typed state variables on a
    ``StatefulProcessor``, the successor surface to
    ``applyInPandasWithState``; requires the RocksDB state store, which
    the query wrapper enables).  State is one (max, n) pair per key —
    O(|keys|) — and the per-key LAST emission is the running answer;
    with a single trigger each key emits exactly once, so the drained
    table equals the batch GROUP BY (the oracle).  MAX is order-free
    (unlike a double SUM), so the value is engine-exact with no decimal
    scaffolding.

    RUNTIME DEPENDENCY: the API's state-server protocol imports
    ``google.protobuf`` on the Python side; in environments without it
    (this container — installs forbidden) the streaming query crashes
    at initialization, so the registry gates the query out and the
    pytest skips (the ``decode_image_real``/Pillow pattern)."""
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    kt = dict(events.dtypes)[key_col]

    class RunningExtrema(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._agg = handle.getValueState("agg", "mx double, n bigint")

        def handleInputRows(self, key, rows, timerValues):
            mx, n = self._agg.get() if self._agg.exists() else (None, 0)
            for pdf in rows:
                v = pdf[value_col].dropna()
                if len(v):
                    m = float(v.max())
                    mx = m if mx is None or m > mx else mx
                n += len(pdf)
            self._agg.update((mx, n))
            yield pd.DataFrame(
                {key_col: [key[0]], "max_value": [mx], "n_events": [n]}
            )

        def close(self) -> None:
            pass

    return events.groupBy(key_col).transformWithStateInPandas(
        statefulProcessor=RunningExtrema(),
        outputStructType=f"{key_col} {kt}, max_value double, n_events bigint",
        outputMode="Update",
        timeMode="None",
    )


def running_extrema_apws(
    events: DataFrame,
    key_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Per-key running MAX + row count via ``applyInPandasWithState`` —
    the SAME operator contract as :func:`running_extrema_stateful`
    (per-key LAST emission is the running answer; one trigger ⇒ the
    drained table equals the batch GROUP BY) on the protobuf-free
    GroupState API, so this twin can face the driver in environments
    where the transformWithStateInPandas state server cannot start.
    MAX is order-free, so the value is engine-exact with no decimal
    scaffolding."""

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        mx, n = state.get if state.exists else (None, 0)
        for pdf in pdfs:
            v = pdf[value_col].dropna()
            if len(v):
                m = float(v.max())
                mx = m if mx is None or m > mx else mx
            n += len(pdf)
        state.update((mx, n))
        yield pd.DataFrame(
            {key_col: [key[0]], "max_value": [mx], "n_events": [n]}
        )

    kt = dict(events.dtypes)[key_col]
    return events.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=f"{key_col} {kt}, max_value double, n_events bigint",
        stateStructType="max_value double, n_events bigint",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def ewma_daily_stateful(
    events: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Stateful streaming EWMA of the per-key DAILY event count — the
    online form of the batch ``ts_ewma`` query, sharing its exact
    contract (α = 3/10 over ``operators.timeseries.EWMA_SPAN``
    observation lags, renormalized, integer-scaled weights
    ``ewma_coef``): the smoothed series an ingest monitor tails while
    data is still arriving.

    State per key is the day→count map of days seen so far (bounded by
    the stream's calendar span; with a timeout it becomes a sliding
    horizon).  Each trigger merges its batch's counts into state and
    re-emits the affected series — per-key LAST emission wins, so with
    one availableNow trigger the drained table IS the batch answer and
    hash-matches the same SQL oracle as ts_ewma (round-free form: the
    kernel's Python ints divide in ONE IEEE op, bit-equal to
    HUGEINT→DOUBLE division).

    Scale: the Arrow batch carries raw events, the state carries one
    int per (key, day) — the corpus never sits in memory; keys process
    independently (the state store partitions by key)."""
    from ..operators.timeseries import EWMA_SPAN, ewma_coef

    coefs = [ewma_coef(k) for k in range(EWMA_SPAN)]

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        days, counts = state.get if state.exists else ([], [])
        acc = dict(zip(list(days), [int(c) for c in counts]))
        for pdf in pdfs:
            ts = pdf[ts_col].dropna()
            if not len(ts):
                continue
            for day, c in ts.dt.strftime("%Y-%m-%d").value_counts().items():
                acc[day] = acc.get(day, 0) + int(c)
        if not acc:
            return
        ordered = sorted(acc)
        ys = [acc[d] for d in ordered]
        out_ewma = []
        for t in range(len(ys)):
            lags = min(t + 1, EWMA_SPAN)
            num = sum(coefs[k] * ys[t - k] for k in range(lags))
            den = sum(coefs[k] for k in range(lags))
            out_ewma.append(float(num) / float(den))  # ONE IEEE divide
        state.update((ordered, ys))
        yield pd.DataFrame(
            {
                key_col: [key[0]] * len(ordered),
                "day": ordered,
                "y": pd.Series(ys, dtype="int64"),
                "ewma": pd.Series(out_ewma, dtype="float64"),
            }
        )

    kt = dict(events.dtypes)[key_col]
    return events.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=f"{key_col} {kt}, day string, y bigint, ewma double",
        stateStructType="days array<string>, counts array<bigint>",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
