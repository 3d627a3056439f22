"""Physical-plan inspection helpers.

The 100 TB posture is enforced here, not hoped for: tests assert that
filters reach the parquet scan (``PushedFilters``), that scans decode
only the projected columns (``ReadSchema``), and that no accidental
cartesian product appears.  ``.explain`` output is the source of truth.
"""

from __future__ import annotations

import io
import re as _re
from contextlib import redirect_stdout

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def assert_pushed_filters(df: DataFrame, *fragments: str) -> str:
    """Assert each fragment appears in a PushedFilters: [...] clause."""
    plan = explain_str(df)
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    joined = "\n".join(pushed)
    for frag in fragments:
        assert frag in joined, f"filter {frag!r} not pushed; PushedFilters lines:\n{joined}\n\nfull plan:\n{plan}"
    return plan


def assert_read_schema_only(df: DataFrame, table_marker: str, allowed: set[str]) -> str:
    """Assert the scan whose ReadSchema line contains ``table_marker``
    reads no columns beyond ``allowed`` (column-pruning check)."""
    plan = explain_str(df)
    # Formatted explain prints each scan as a "(N) Scan ..." detail block whose
    # Location and ReadSchema are separate lines — scope the marker per block.
    in_marked_block = False
    checked = False
    for ln in plan.splitlines():
        if _re.match(r"^\(\d+\) ", ln):
            in_marked_block = False
        if table_marker in ln:
            in_marked_block = True
        if "ReadSchema" in ln and in_marked_block:
            # ReadSchema: struct<a:int,b:struct<c:int,d:int>,...> —
            # split on TOP-LEVEL commas only (naive splitting would
            # surface nested struct fields as phantom columns), and
            # refuse truncated lines (Spark elides long schemas with
            # '... N more fields', hiding columns from the assertion).
            assert "more fields" not in ln, (
                "ReadSchema truncated — raise spark.sql.maxMetadataStringLength "
                f"before asserting pruning; line: {ln}"
            )
            inner = ln.split("struct<", 1)[-1].rsplit(">", 1)[0]
            cols, depth, start = set(), 0, 0
            for i, ch in enumerate(inner + ","):
                if ch == "<":
                    depth += 1
                elif ch == ">":
                    depth -= 1
                elif ch == "," and depth == 0:
                    field = inner[start:i]
                    if ":" in field:
                        cols.add(field.split(":", 1)[0].strip())
                    start = i + 1
            extra = cols - allowed
            assert not extra, f"scan reads unexpected columns {extra}; line: {ln}"
            checked = True
    assert checked, f"no scan matching {table_marker!r} found in plan:\n{plan}"
    return plan


def assert_no_cartesian(df: DataFrame) -> str:
    plan = explain_str(df)
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan, (
        "unexpected cartesian/nested-loop join in plan:\n" + plan
    )
    return plan
