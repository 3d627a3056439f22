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
