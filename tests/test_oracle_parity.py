"""Pre-flight for the driver's CORRECTNESS gate: every queries() entry
with an oracle must hash-match DuckDB at sf0.001 (driver uses sf0.01)."""

from __future__ import annotations

import importlib

import pytest

from .conftest import SF_DIR
from .oracle import assert_frames_match, duck_connect

_entry = importlib.import_module("__spark_entry__")
QUERIES = _entry.queries()
ORACLES = _entry.oracle_sql()


@pytest.fixture(scope="module")
def duck():
    con = duck_connect(SF_DIR)
    yield con
    con.close()


def test_every_oracle_key_has_a_query():
    assert set(ORACLES) <= set(QUERIES)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, duck, name):
    sdf = QUERIES[name](spark, SF_DIR)
    pdf = sdf.toPandas()
    if name not in ORACLES:
        # rows-only contract: must run and have a stable, non-degenerate schema
        assert len(pdf.columns) > 0
        return
    odf = duck.execute(ORACLES[name]).df()
    assert_frames_match(pdf, odf, name)


def test_entry_smoke(spark):
    df = _entry.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0 and len(df.columns) >= 1
