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
import uuid
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


class QueryCancelled(RuntimeError):
    """Raised by :meth:`CancellableQuery.result` when the run was killed
    via :meth:`CancellableQuery.cancel` — the analogue of the reference's
    orchestration landing in the ``Terminated`` runtime status."""


class CancellableQuery:
    """A running query that can be killed mid-flight — the reference's
    terminate endpoint (``Sample.cs:38`` ``CreateCheckStatusResponse``
    returns a terminate URI; ``README.md:172-189`` documents POSTing it
    to abort the orchestration).

    Spark's native mechanism is job groups: the action runs on a worker
    thread under a unique ``setJobGroup`` (thread-local under PySpark's
    default pinned-thread mode), and :meth:`cancel` issues
    ``cancelJobGroup`` from any other thread — every job the action has
    launched or will launch under the group dies, with
    ``interruptOnCancel`` so straggler tasks are interrupted rather than
    drained.  Driver-side only; nothing touches the query plan, so this
    works unchanged against a 1000-executor cluster.

    The lifecycle is observable through the same :class:`CustomStatus`
    surface as :func:`run_with_progress` — phases ``started`` →
    (``terminated`` | ``finished`` | ``failed``) — mirroring the
    reference's pollable ``runtimeStatus``.
    """

    def __init__(
        self,
        spark: SparkSession,
        action: Callable[[], Any],
        label: str = "query",
        status: CustomStatus | None = None,
    ) -> None:
        self._spark = spark
        self.group = f"cancellable-{uuid.uuid4().hex[:12]}"
        self.status = status or CustomStatus()
        self._done = threading.Event()
        self._cancelled = False
        self._result: Any = None
        self._error: BaseException | None = None

        def run() -> None:
            sc = spark.sparkContext
            sc.setJobGroup(self.group, label, interruptOnCancel=True)
            try:
                self._result = action()
            except BaseException as exc:  # noqa: BLE001 — recorded, re-raised in result()
                self._error = exc
            finally:
                sc.setJobGroup(None, None)
                self._done.set()
                if self._cancelled:
                    pass  # terminal status already written by cancel()
                elif self._error is None:
                    self.status.set("finished", label=label)
                else:
                    self.status.set("failed", label=label)

        self.status.set("started", label=label, group=self.group)
        self._thread = threading.Thread(target=run, daemon=True)
        self._thread.start()

    def cancel(self, reason: str = "terminated by caller") -> None:
        """Kill every job in this run's group.  Idempotent; safe to call
        from any thread — the POST-the-terminate-URI analogue.  On an
        already-finished run this is a no-op (the reference's terminate
        on a completed orchestration does nothing): the terminal status
        and the result stand."""
        if self._done.is_set():
            return
        self._cancelled = True
        self.status.set("terminated", reason=reason, group=self.group)
        self._spark.sparkContext.cancelJobGroup(self.group)

    def done(self) -> bool:
        return self._done.is_set()

    def result(self, timeout: float | None = None) -> Any:
        """Block for the outcome: the action's return value, or
        :class:`QueryCancelled` after :meth:`cancel`, or the action's
        own exception."""
        if not self._done.wait(timeout):
            raise TimeoutError(f"query {self.group} still running")
        if self._cancelled:
            raise QueryCancelled(self.group)
        if self._error is not None:
            raise self._error
        return self._result


def run_cancellable(
    spark: SparkSession,
    action: Callable[[], Any],
    label: str = "query",
    status: CustomStatus | None = None,
) -> CancellableQuery:
    """Start ``action`` under a cancellable job group and return the
    handle immediately (the reference's 202-with-terminate-URI shape:
    submission returns control; the handle carries status + terminate)."""
    return CancellableQuery(spark, action, label=label, status=status)


def run_with_observed_metrics(
    df,
    metrics,
    action: Callable[[Any], Any] | None = None,
) -> tuple[Any, dict[str, Any]]:
    """Execute ``df`` once while collecting named aggregate metrics IN
    THE SAME PASS via Spark's ``Observation`` API — the idiomatic
    replacement for the reference's per-mapper row-count logging
    (``Sample.cs:170-189`` counts total and invalid rows as a side
    effect of the scan): no second job, no accumulator races (observed
    metrics are exactly-once per successful action, unlike raw
    accumulators which double-count on task retries — the reason this
    API exists).

    ``metrics``: dict of name -> aggregate Column (e.g. ``{"rows":
    F.count(F.lit(1)), "invalid": F.count(F.when(...))}``).
    ``action``: callable receiving the observed DataFrame and running
    ONE action on it (default: noop-format write — the bench
    convention).  Returns (action result, {metric: value}).

    At 100 TB this is the only sane way to audit a pipeline run: the
    counters ride the existing scan; a separate count() job would
    double the I/O.
    """
    from pyspark.sql import Observation

    obs = Observation("observed_metrics")
    named = [c.alias(n) for n, c in metrics.items()]
    observed = df.observe(obs, *named)
    if action is None:
        def action(d):
            d.write.format("noop").mode("overwrite").save()
            return None
    result = action(observed)
    return result, dict(obs.get)
