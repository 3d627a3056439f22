"""Progress reporting — the ``SetCustomStatus`` analogue (X4).

The reference surfaces orchestration progress to pollers via
``SetCustomStatus`` phase strings (``Sample.cs:55-88``; the status HTTP
API in ``README.md:172-189``).  Spark's native equivalents are the
``statusTracker`` (job/stage/task counters) and listener buses; this
module packages both behind the same tiny surface the reference offers:
a *current status* plus its history, observable WHILE a query runs.

Design: pure observation, zero overhead on the query plan — a daemon
thread samples ``SparkStatusTracker`` while the action executes on the
caller's thread.  Nothing here touches data paths, so it works
unchanged on a 1000-executor cluster (the tracker aggregates
cluster-wide task counts driver-side).
"""

from __future__ import annotations

import threading
import time
from typing import Any, Callable

from pyspark.sql import SparkSession


class CustomStatus:
    """Thread-safe current-status cell with history — what the
    reference's ``SetCustomStatus``/``GetStatusAsync`` pair exposes."""

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self._current: dict[str, Any] | None = None
        self.history: list[dict[str, Any]] = []

    def set(self, phase: str, **detail: Any) -> None:
        entry = {"phase": phase, "at": time.time(), **detail}
        with self._lock:
            self._current = entry
            self.history.append(entry)

    def get(self) -> dict[str, Any] | None:
        with self._lock:
            return self._current

    def phases(self) -> list[str]:
        with self._lock:
            return [e["phase"] for e in self.history]


def _snapshot(spark: SparkSession) -> dict[str, Any]:
    tracker = spark.sparkContext.statusTracker()
    stages = []
    for sid in tracker.getActiveStageIds():
        info = tracker.getStageInfo(sid)
        if info is not None:
            stages.append(
                {
                    "stage": sid,
                    "tasks": info.numTasks,
                    "active": info.numActiveTasks,
                    "completed": info.numCompletedTasks,
                    "failed": info.numFailedTasks,
                }
            )
    return {"jobs": list(tracker.getActiveJobsIds()), "stages": stages}


def run_with_progress(
    spark: SparkSession,
    action: Callable[[], Any],
    status: CustomStatus | None = None,
    poll_interval: float = 0.1,
    label: str = "query",
) -> tuple[Any, CustomStatus]:
    """Run a Spark action while reporting progress into ``status``.

    Mirrors the reference's phase narration: a ``started`` status, a
    ``running`` status per tracker sample (with live cluster-wide
    job/stage/task counts), and a terminal ``finished``/``failed`` —
    observable concurrently via ``status.get()`` exactly like the
    reference's status-query endpoint.
    """
    status = status or CustomStatus()
    stop = threading.Event()

    def poll() -> None:
        while not stop.is_set():
            try:
                status.set("running", label=label, **_snapshot(spark))
            except Exception:
                # transient tracker/py4j hiccup (driver GC pause etc.):
                # keep polling — exiting would freeze status at a stale
                # sample for the rest of the job.  Shutdown is signalled
                # by `stop`, not by errors.
                pass
            stop.wait(poll_interval)

    status.set("started", label=label)
    t = threading.Thread(target=poll, daemon=True)
    t.start()
    try:
        result = action()
    except BaseException:
        stop.set()
        t.join(timeout=5)
        status.set("failed", label=label)
        raise
    stop.set()
    t.join(timeout=5)
    status.set("finished", label=label)
    return result, status
