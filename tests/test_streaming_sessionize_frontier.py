"""Pin the APPEND-mode session_window emission + merge semantics.

Two empirical edges the oracle must get right:

* MERGE: Spark merges session windows that merely TOUCH — an
  exactly-30-min gap continues the session (windows [t, t+gap) and
  [t+gap, t+2gap) share a boundary and coalesce), so the oracle's
  island break is ``gap > 30 min`` strictly.
* EMIT: a session emits once its close (last event + 30 min) is
  ``<= watermark`` — NON-strict, unlike the stream-stream interval
  join's strict eviction (test_streaming_left_outer_frontier): a
  session closing exactly AT the final watermark IS emitted.

Synthetic events exercise both edges plus a held session, through both
the real streaming query and the registered DuckDB oracle.
"""

from __future__ import annotations

import datetime as dt
import os

import duckdb
import pandas as pd
import pytest

from durablefunctions_mapreduce_dotnet_spark.queries.streaming_q import (
    _STREAM_SESSIONIZE_SQL,
)
from durablefunctions_mapreduce_dotnet_spark.streaming.stream_ops import (
    streaming_sessionize,
)

from .oracle import assert_frames_match


def _t(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


# Max ts = 2024-01-05 12:00 (the click) -> final watermark 01-05 10:00.
_ROWS = [
    # (event_id, ts, event_type, user_id, value)
    (1, _t("2024-01-01 10:00:00"), "view", 1, 1.0),
    (2, _t("2024-01-01 10:29:00"), "view", 1, 1.0),  # 29 min: merges
    (3, _t("2024-01-01 10:59:00"), "view", 1, 1.0),  # exactly 30 min: STILL merges
    (9, _t("2024-01-05 12:00:00"), "click", 9, 1.0),  # watermark driver; own session held
    (4, _t("2024-01-05 09:30:00"), "view", 2, 1.0),  # close == wm exactly: EMITS
    (5, _t("2024-01-05 09:29:59"), "view", 3, 1.0),  # close 1 s inside wm: emits
    (6, _t("2024-01-05 11:00:00"), "view", 4, 1.0),  # close > wm: held
]

_EXPECTED = [
    (1, "2024-01-01 10:00:00.000000", 3),
    (2, "2024-01-05 09:30:00.000000", 1),
    (3, "2024-01-05 09:29:59.000000", 1),
]


@pytest.fixture(scope="module")
def sess_dir(tmp_path_factory, spark):
    d = str(tmp_path_factory.mktemp("sessionize_gap"))
    pdf = pd.DataFrame(
        _ROWS, columns=["event_id", "ts", "event_type", "user_id", "value"]
    )
    spark.createDataFrame(pdf).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(d, "events.parquet")
    )
    return d


def test_spark_emission_set(spark, sess_dir):
    got = [tuple(r) for r in streaming_sessionize(spark, sess_dir).collect()]
    assert got == _EXPECTED, got


@pytest.mark.parametrize("mfpt", [2, 3])
def test_emission_set_batch_boundary_invariant(spark, sess_dir, mfpt):
    """r12 VERDICT #6 — batch-boundary sensitivity of the frontier
    edges: the restaged 8 arrival files grouped 2 or 3 per micro-batch
    change WHEN the watermark advances, but the final emission set —
    including the session closing EXACTLY at the final watermark
    (user 2) — must be identical to the one-file-per-trigger run the
    oracle mirrors.  A data-dependent pass at mfpt=1 would surface
    here (the left-outer frontier lesson)."""
    got = [
        tuple(r)
        for r in streaming_sessionize(
            spark, sess_dir, max_files_per_trigger=mfpt
        ).collect()
    ]
    assert got == _EXPECTED, (mfpt, got)


@pytest.mark.parametrize(
    "sf,mfpt", [("0.001", 2), ("0.001", 3), ("0.01", 2), ("0.01", 3)]
)
def test_oracle_parity_multi_trigger(spark, sf, mfpt):
    """The registered oracle must hold under every trigger grouping at
    real data scales, not just the mfpt=1 arrival order the driver
    exercises."""
    sfd = f"/root/testdata/sf{sf}"
    sdf = streaming_sessionize(spark, sfd, max_files_per_trigger=mfpt).toPandas()
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{sfd}/events.parquet')"
        )
        odf = con.execute(_STREAM_SESSIONIZE_SQL).df()
    finally:
        con.close()
    assert_frames_match(sdf, odf, f"streaming_sessionize[sf{sf},mfpt{mfpt}]")


def test_oracle_mirrors_spark_semantics(spark, sess_dir):
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{sess_dir}/events.parquet/*.parquet')"
        )
        odf = con.execute(_STREAM_SESSIONIZE_SQL).df()
    finally:
        con.close()
    sdf = streaming_sessionize(spark, sess_dir).toPandas()
    assert_frames_match(sdf, odf, "streaming_sessionize[gap]")
    assert len(odf) == len(_EXPECTED)
