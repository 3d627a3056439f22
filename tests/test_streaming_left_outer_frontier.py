"""Pin the stream-stream LEFT OUTER join's watermark-frontier semantics.

Spark's global watermark under the default ``multipleWatermarkPolicy=min``
is the MIN of the per-side watermarks, and each side's watermark advances
only from rows that pass its own ``event_type`` filter — click/error/
signup rows never move either side, and the two join sides' maxima can
differ by hours.  An oracle frontier of ``MAX(ts) over ALL events - 2h``
is therefore strictly AHEAD of Spark's and only matches by accident
(r11's hash passed because no unmatched view's window happened to close
inside the gap).  This test makes the gap non-accidental: synthetic
events where

* one unmatched view's window end falls BETWEEN the two per-side
  frontiers (must stay in state — the old all-events frontier would
  wrongly emit it),
* one unmatched view's window end equals the watermark EXACTLY (eviction
  is strict ``end < watermark``, so it must stay too),
* one closes 1 s inside the watermark (must emit with the -1 sentinel),

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
    _STREAM_LEFT_OUTER_SQL,
)
from durablefunctions_mapreduce_dotnet_spark.streaming.stream_ops import (
    streaming_join_left_outer,
)

from .oracle import assert_frames_match


def _t(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


# View-side max = 2024-01-05 00:00 -> view frontier 01-04 22:00.
# Purchase-side max = 2024-01-02 08:00 -> purchase frontier 01-02 06:00.
# Global watermark = min = 2024-01-02 06:00.  The 'click' at 01-06 is the
# poison row: an all-events frontier would sit at 01-05 22:00.
_ROWS = [
    # (event_id, ts, event_type, user_id, value)
    (101, _t("2024-01-01 00:00:00"), "view", 1, 1.0),  # matched by 201
    (201, _t("2024-01-01 05:00:00"), "purchase", 1, 1.0),
    (102, _t("2024-01-01 00:00:00"), "view", 2, 1.0),  # end 01-02 00:00 < wm: emits -1
    (103, _t("2024-01-03 12:00:00"), "view", 3, 1.0),  # end in the inter-side GAP: held
    (202, _t("2024-01-02 08:00:00"), "purchase", 9, 1.0),  # purchase-side max
    (104, _t("2024-01-05 00:00:00"), "view", 8, 1.0),  # view-side max; held
    (301, _t("2024-01-06 00:00:00"), "click", 7, 1.0),  # advances NO side
    (105, _t("2024-01-01 06:00:00"), "view", 4, 1.0),  # end == wm exactly: held
    (106, _t("2024-01-01 05:59:59"), "view", 5, 1.0),  # end 1 s inside wm: emits -1
]

_EXPECTED = [
    (1, 101, 201),
    (2, 102, -1),
    (5, 106, -1),
]


@pytest.fixture(scope="module")
def gap_dir(tmp_path_factory, spark):
    d = str(tmp_path_factory.mktemp("leftouter_gap"))
    pdf = pd.DataFrame(
        _ROWS, columns=["event_id", "ts", "event_type", "user_id", "value"]
    )
    spark.createDataFrame(pdf).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(d, "events.parquet")
    )
    return d


def test_spark_emission_set(spark, gap_dir):
    got = [tuple(r) for r in streaming_join_left_outer(spark, gap_dir).collect()]
    assert got == _EXPECTED, got


def test_oracle_mirrors_spark_frontier(spark, gap_dir):
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{gap_dir}/events.parquet/*.parquet')"
        )
        odf = con.execute(_STREAM_LEFT_OUTER_SQL).df()
    finally:
        con.close()
    sdf = streaming_join_left_outer(spark, gap_dir).toPandas()
    assert_frames_match(sdf, odf, "streaming_join_left_outer[gap]")
    assert len(odf) == len(_EXPECTED)
