"""Pin the stream-stream FULL OUTER join's watermark-frontier semantics.

The left-outer sibling (tests/test_streaming_left_outer_frontier.py)
pins the VIEW side's rule: an unmatched view emits only once the global
min-of-sides watermark strictly passes its window end ``vts + 1 day``.
The full outer join adds the PURCHASE side, whose frontier is a day
TIGHTER: matchable views carry ``vts ∈ [bts − 1 day, bts]`` and future
views only grow ``vts``, so a purchase is resolvable as soon as the
watermark strictly passes ``bts`` itself.  Synthetic events pin both
edges:

* a purchase with ``bts`` strictly inside the watermark emits with the
  -1 view sentinel,
* a purchase with ``bts`` EQUAL to the watermark stays in state
  (eviction is strict ``<``, same as the view side),
* the purchase-side max (ahead of the watermark) stays in state,
* the view-side cases re-verify the left-outer rule through the
  full-outer code path,

run through BOTH the real streaming query and the registered DuckDB
oracle, which must agree row-for-row.
"""

from __future__ import annotations

import datetime as dt
import os

import duckdb
import pandas as pd
import pytest

from durablefunctions_mapreduce_dotnet_spark.queries.streaming_q import (
    _STREAM_FULL_OUTER_SQL,
)
from durablefunctions_mapreduce_dotnet_spark.streaming.stream_ops import (
    streaming_join_full_outer,
)

from .oracle import assert_frames_match


def _t(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


# View-side max = 2024-01-05 00:00 -> view frontier 01-04 22:00.
# Purchase-side max = 2024-01-02 08:00 -> purchase frontier 01-02 06:00.
# Global watermark = min = 2024-01-02 06:00.  The 'click' at 01-06 is
# the poison row: an all-events frontier would sit at 01-05 22:00.
_ROWS = [
    # (event_id, ts, event_type, user_id, value)
    (101, _t("2024-01-01 00:00:00"), "view", 1, 1.0),  # matched by 201
    (201, _t("2024-01-01 05:00:00"), "purchase", 1, 1.0),
    (102, _t("2024-01-01 00:00:00"), "view", 2, 1.0),  # end < wm: emits (102, -1)
    (105, _t("2024-01-01 06:00:00"), "view", 4, 1.0),  # end == wm exactly: held
    (104, _t("2024-01-05 00:00:00"), "view", 8, 1.0),  # view-side max; held
    (203, _t("2024-01-01 05:00:00"), "purchase", 6, 1.0),  # bts < wm: emits (-1, 203)
    (204, _t("2024-01-02 06:00:00"), "purchase", 7, 1.0),  # bts == wm exactly: held
    (202, _t("2024-01-02 08:00:00"), "purchase", 9, 1.0),  # purchase-side max; held
    (301, _t("2024-01-06 00:00:00"), "click", 5, 1.0),  # advances NO side
]

_EXPECTED = [
    (1, 101, 201),
    (2, 102, -1),
    (6, -1, 203),
]


@pytest.fixture(scope="module")
def gap_dir(tmp_path_factory, spark):
    d = str(tmp_path_factory.mktemp("fullouter_gap"))
    pdf = pd.DataFrame(
        _ROWS, columns=["event_id", "ts", "event_type", "user_id", "value"]
    )
    spark.createDataFrame(pdf).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(d, "events.parquet")
    )
    return d


def test_spark_emission_set(spark, gap_dir):
    got = [tuple(r) for r in streaming_join_full_outer(spark, gap_dir).collect()]
    assert got == _EXPECTED, got


def test_oracle_mirrors_spark_frontier(spark, gap_dir):
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW events AS SELECT * FROM read_parquet("
            f"'{os.path.join(gap_dir, 'events.parquet')}/*.parquet')"
        )
        oracle = con.execute(_STREAM_FULL_OUTER_SQL).df()
    finally:
        con.close()
    got = streaming_join_full_outer(spark, gap_dir).toPandas()
    assert_frames_match(got, oracle, "streaming_join_full_outer")
