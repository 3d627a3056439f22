"""Gap-filling / interpolation over regular time grids — the
``time_bucket_gapfill`` + ``locf()`` + ``interpolate()`` surface of a
hypertable engine, re-expressed on Spark windows.

The reference has no time-series surface at all (its one time function
is day-of-week extraction, ``Sample.cs:189``); this is the standard
continuous-aggregate companion: densify each series onto a fixed-step
grid, then fill holes by last-observation-carried-forward and by linear
interpolation between the neighboring observations.

Plan shape (100 TB posture):

* Bucketing is a pure row expression (integer ``div`` on epoch micros).
* The per-bucket representative value is a struct-extremum
  (``max(struct(ts, id, value))``) riding the SAME hash aggregate as
  the bucket groupBy — exact, tie-broken, no window pass.
* The grid is ``sequence(min_bucket, max_bucket)`` exploded per series
  — generated JVM-side from a k-row aggregate, never shuffled at grid
  size; join back to observations is (series, bucket)-keyed.
* Both fills are ONE window pass each direction over the densified
  frame (``last(..., ignorenulls)`` backward state / ``first(...,
  ignorenulls)`` forward), partitioned by series — state per partition
  is O(1), late/skewed series never serialize on a single task beyond
  their own rows.

Determinism: fills copy exact observed doubles; linear interpolation is
the literal expression ``pv + (nv - pv) * ((b - pb) / (nb - pb))``
with integer bucket arithmetic, mirrored operation-for-operation in the
SQL oracle so IEEE doubles agree bitwise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def gap_fill(
    df: DataFrame,
    series_col: str,
    ts_col: str,
    value_col: str,
    step_seconds: int,
    id_col: str = "event_id",
    pinned: list[DataFrame] | None = None,
) -> DataFrame:
    """Densified (series, bucket) grid with columns:

    ``bucket``   epoch-second bucket start (bigint, step-aligned)
    ``v_obs``    value of the LAST observation in the bucket (by
                 (ts, id) — exact struct-extremum tie-break), NULL in gaps
    ``v_locf``   v_obs carried forward (NULL before the first obs)
    ``v_lin``    linear interpolation between neighboring observed
                 buckets (NULL outside [first, last] obs)

    TIMESTAMP_NTZ inputs are reinterpreted in the SESSION time zone
    before epoch bucketing — run with ``spark.sql.session.timeZone=UTC``
    (``session.tune`` pins it) or bucket labels shift by the zone offset
    and, for steps not dividing that offset, bucket membership moves.

    The bucket aggregate is pinned MEMORY_AND_DISK for its two consumers
    (grid bounds + densifying join); the pin cannot be released here
    (the returned plan still reads it), so long-lived sessions calling
    this in a loop should pass ``pinned=[]`` and ``unpersist()`` the
    appended frame after consuming the result — the same contract as
    ``windows.global_distribution_rank``.
    """
    ts = F.col(ts_col)
    if dict(df.dtypes).get(ts_col) == "timestamp_ntz":
        ts = ts.cast("timestamp")
    step_us = step_seconds * 1_000_000
    obs = (
        df.select(
            F.col(series_col).alias("series"),
            # explicit floor: Spark's double->bigint cast truncates while
            # DuckDB's rounds, so the oracle mirrors floor() verbatim
            F.floor(F.unix_micros(ts) / F.lit(step_us)).cast("bigint").alias("bucket"),
            F.struct(ts.alias("_t"), F.col(id_col).alias("_i"), F.col(value_col).alias("_v")).alias("_s"),
        )
        .groupBy("series", "bucket")
        .agg(F.max("_s")["_v"].alias("v_obs"))
    )
    # obs feeds TWO consumers (grid bounds + the densifying join);
    # pinned evictable so the scan + bucket aggregate runs once, not
    # twice (same discipline as windows.global_distribution_rank)
    from pyspark.storagelevel import StorageLevel

    obs = obs.persist(StorageLevel.MEMORY_AND_DISK)
    if pinned is not None:
        pinned.append(obs)
    # grid size is data-dependent (span / step per series): one corrupt
    # epoch-0 timestamp in a current-dated corpus would demand a
    # billion-element sequence and OOM the executor — fail loudly with
    # the offending series instead (assert_true keeps the check lazy,
    # inside the same job).
    max_buckets = 10_000_000
    guarded_mx = F.when(
        (F.col("_mx") - F.col("_mn")) < F.lit(max_buckets), F.col("_mx")
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit("gap_fill: series "),
                F.col("series").cast("string"),
                F.lit(
                    f" spans more than {max_buckets} buckets — outlier "
                    "timestamp or step_seconds too small"
                ),
            )
        ).cast("bigint")
    )
    grid = (
        obs.groupBy("series")
        .agg(F.min("bucket").alias("_mn"), F.max("bucket").alias("_mx"))
        .select("series", F.explode(F.sequence("_mn", guarded_mx)).alias("bucket"))
    )
    dense = grid.join(obs, ["series", "bucket"], "left")

    back = Window.partitionBy("series").orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    fwd = Window.partitionBy("series").orderBy("bucket").rowsBetween(
        Window.currentRow, Window.unboundedFollowing
    )
    packed = F.when(
        F.col("v_obs").isNotNull(), F.struct(F.col("bucket").alias("b"), F.col("v_obs").alias("v"))
    )
    prev = F.last(packed, ignorenulls=True).over(back)
    nxt = F.first(packed, ignorenulls=True).over(fwd)
    lin = F.when(
        F.col("v_obs").isNotNull(), F.col("v_obs")
    ).otherwise(
        prev["v"]
        + (nxt["v"] - prev["v"])
        * ((F.col("bucket") - prev["b"]) / (nxt["b"] - prev["b"]))
    )
    return dense.select(
        "series",
        (F.col("bucket") * F.lit(step_seconds)).alias("bucket"),
        "v_obs",
        prev["v"].alias("v_locf"),
        lin.alias("v_lin"),
    )


def detect_gaps(
    df: DataFrame,
    series_col: str,
    ts_col: str,
    threshold_seconds: int,
    id_col: str = "event_id",
) -> DataFrame:
    """Missing-data detector — the inverse of :func:`gap_fill`: one row
    per gap where a series goes silent longer than ``threshold_seconds``
    (``gap_start`` = last observation before silence, ``gap_end`` = first
    after, ``gap_seconds`` = integer delta).

    ONE lag window per series (same single shuffle as sessionization —
    a gap is exactly a session boundary read the other way), integer
    epoch-second arithmetic so both engines agree exactly.  Emits only
    gap rows, so output is O(gaps), not O(observations).
    """
    ts = F.col(ts_col)
    if dict(df.dtypes).get(ts_col) == "timestamp_ntz":
        ts = ts.cast("timestamp")
    sec = F.unix_micros(ts)
    w = Window.partitionBy("series").orderBy("t_us", "_id")
    obs = df.select(
        F.col(series_col).alias("series"),
        sec.alias("t_us"),
        F.col(id_col).alias("_id"),
    )
    prev = F.lag("t_us").over(w)
    return (
        obs.withColumn("_prev", prev)
        .where((F.col("t_us") - F.col("_prev")) > threshold_seconds * 1_000_000)
        .select(
            "series",
            F.col("_prev").alias("gap_start_us"),
            F.col("t_us").alias("gap_end_us"),
            # explicit floor: Spark's double->long cast truncates while
            # DuckDB's rounds (same guard as gap_fill's bucketing)
            F.floor((F.col("t_us") - F.col("_prev")) / F.lit(1_000_000.0))
            .cast("long")
            .alias("gap_seconds"),
        )
        .orderBy("series", "gap_start_us")
    )
