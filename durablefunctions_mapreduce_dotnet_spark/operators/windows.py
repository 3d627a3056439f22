"""Window-function operators: sessionization and friends.

Absent from the reference (SURVEY.md §2.2); built on Spark's native
window exec.  Every ordered window here uses a total order (ts +
unique id tie-break) so results are deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def global_distribution_rank(
    df: DataFrame,
    order_cols: list[str],
    ntile_k: int = 4,
) -> DataFrame:
    """Global row_number / ntile / percent_rank / cume_dist WITHOUT a
    single-partition window — the distributed form of ``OVER (ORDER BY
    …)`` distribution functions.

    Classic two-pass range-partitioned rank:

    1. ``repartitionByRange`` on the order columns (sampled boundaries —
       the same exchange a global ``orderBy`` uses), then a
       per-partition sort + local ``row_number`` — all parallel.
    2. The ranked pass is pinned with ``localCheckpoint`` (so the
       sampled range boundaries can't re-randomize between jobs), then
       per-partition counts (one tiny P-row collect) become broadcast
       cumulative offsets: ``global_rn = offset[pid] + local_rn``.

    Distribution functions follow arithmetically from ``global_rn`` and
    the total count — exact, because ``order_cols`` must be a total
    order (unique tie-break), which makes rank == row_number.  At
    production scale swap ``localCheckpoint`` (executor memory) for
    ``persist(DISK_ONLY)`` or a reliable checkpoint; the plan shape is
    unchanged.  Adds columns: _rn, quartile (ntile_k-tile), pct_rank,
    cume — no SinglePartition exchange anywhere (plan-asserted in
    tests/test_plans.py).
    """
    spark = df.sparkSession
    p = spark.sparkContext.defaultParallelism
    ranged = df.repartitionByRange(p, *[F.col(c) for c in order_cols]).withColumn(
        "_pid", F.spark_partition_id()
    )
    w = Window.partitionBy("_pid").orderBy(*order_cols)
    local = ranged.withColumn("_lrn", F.row_number().over(w)).localCheckpoint(eager=True)

    counts = {
        r["_pid"]: r["_c"]
        for r in local.groupBy("_pid").agg(F.count(F.lit(1)).alias("_c")).collect()
    }
    n = sum(counts.values())
    offsets, acc = [], 0
    for pid in sorted(counts):
        offsets.append((pid, acc))
        acc += counts[pid]
    off = F.broadcast(spark.createDataFrame(offsets or [(0, 0)], "_pid int, _off bigint"))
    rn = (F.col("_off") + F.col("_lrn")).alias("_rn")
    base, rem = divmod(n, ntile_k) if n else (0, 0)
    cut = rem * (base + 1)
    if n < ntile_k:
        tile = F.col("_rn")
    else:
        # first `rem` tiles hold base+1 rows, the rest hold base
        tile = F.when(
            F.col("_rn") <= cut, F.floor((F.col("_rn") - 1) / (base + 1)) + 1
        ).otherwise(rem + F.floor((F.col("_rn") - cut - 1) / base) + 1)
    pct = (
        F.lit(0.0)
        if n <= 1
        else (F.col("_rn") - 1).cast("double") / F.lit(float(n - 1))
    )
    return (
        local.join(off, "_pid")
        .withColumn("_rn", rn)
        .withColumn("quartile", tile.cast("int"))
        .withColumn("pct_rank", pct)
        .withColumn("cume", F.col("_rn").cast("double") / F.lit(float(n)))
        .drop("_pid", "_lrn", "_off")
    )


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    id_col: str = "event_id",
) -> DataFrame:
    """Assign gap-based session ids per user: a new session starts when
    the time since the previous event exceeds ``gap_seconds``.

    lag + cumulative sum over one window — a single shuffle on the user
    key, linear per-user work.  Gap arithmetic is done in integer
    microseconds (``unix_micros``) so it is exact.  ``id_col`` breaks
    timestamp ties so per-row session ids are deterministic (a total
    order, not just ts order).
    """
    order = [ts_col] + ([id_col] if id_col in events.columns else [])
    w = Window.partitionBy(user_col).orderBy(*order)
    gap_us = F.lit(gap_seconds * 1_000_000)
    prev = F.lag(F.unix_micros(F.col(ts_col))).over(w)
    is_new = F.when(
        prev.isNull() | ((F.unix_micros(F.col(ts_col)) - prev) > gap_us), 1
    ).otherwise(0)
    return events.withColumn(
        "session_id",
        F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
