"""Hygiene for the driver-window rotation contract.

The external driver hashes only the first 50 ``queries()`` entries per
round; ``_WINDOW_FIRST`` pins queries that have never earned a
driver-green CORRECTNESS row to the front of that window.  Window slots
are the scarce currency — a name left pinned after its green row lands
silently evicts a query that still needs one.  This test turns that
maintenance rule (queries/__init__.py) from convention into a failure.
"""

from __future__ import annotations

import json
import re
import subprocess
from pathlib import Path

from durablefunctions_mapreduce_dotnet_spark import queries as qreg

REPO = Path(__file__).resolve().parent.parent


def _committed_files() -> set[str] | None:
    """Names of git-tracked files at the repo root, or None if git is absent.

    The driver delivers ``CORRECTNESS_r{N}.json`` AFTER the builder's last
    commit of round N, so the freshest correctness file on disk is usually
    untracked.  Pins going green in that just-delivered file are EXPECTED
    state — the builder drops them at the next round's open, not
    retroactively.  Only a green row in a *committed* correctness file
    means the builder had a chance to act and didn't (the real hygiene
    failure this tripwire exists to catch).
    """
    try:
        out = subprocess.run(
            ["git", "ls-files", "CORRECTNESS_r*.json"],
            cwd=REPO,
            capture_output=True,
            text=True,
            timeout=30,
            check=True,
        )
    except (OSError, subprocess.SubprocessError):
        return None
    return {line.strip() for line in out.stdout.splitlines() if line.strip()}


def _latest_correctness() -> tuple[str, dict] | None:
    committed = _committed_files()
    best: tuple[int, Path] | None = None
    for p in REPO.glob("CORRECTNESS_r*.json"):
        m = re.fullmatch(r"CORRECTNESS_r(\d+)\.json", p.name)
        if m is None:
            continue
        if committed is not None and p.name not in committed:
            continue  # delivered after our last commit — next round's work
        if best is None or int(m.group(1)) > best[0]:
            best = (int(m.group(1)), p)
    if best is None:
        return None
    return best[1].name, json.loads(best[1].read_text())


def _is_green(row: dict) -> bool:
    if row.get("err") and row.get("err") != "no_oracle":
        return False
    # hash-green; or, for oracle-less queries (hash_match is None — the
    # driver's rows-only contract), a recorded run.  An oracle-backed row
    # with hash_match=False is driver-RED even when rows+schema match
    # (r08's time_seasonal_decompose_m12) and must KEEP its pin.
    if row.get("hash_match") is True:
        return True
    if row.get("hash_match") is False:
        return False
    return row.get("err") == "no_oracle" or bool(row.get("rows_match"))


def test_window_first_holds_no_driver_green_names():
    latest = _latest_correctness()
    if latest is None:  # fresh clone without driver artifacts
        return
    fname, rows = latest
    rnd = int(re.fullmatch(r"CORRECTNESS_r(\d+)\.json", fname).group(1))
    stale = [
        name
        for name in qreg._WINDOW_FIRST
        if name in rows
        and _is_green(rows[name])
        # a re-pinned name's OLD green row doesn't retire the pin — only a
        # green row earned at/after the re-pin round does
        and rnd >= qreg._REPINNED.get(name, 0)
    ]
    assert not stale, (
        f"_WINDOW_FIRST pins already driver-green in {fname}: {stale} — "
        "drop them (queries/__init__.py) so the 50-row window covers "
        "queries that still need their first row"
    )


def test_window_first_names_are_registered():
    registered = set(qreg.all_queries())
    missing = [n for n in qreg._WINDOW_FIRST if n not in registered]
    assert not missing, f"_WINDOW_FIRST names not registered: {missing}"
