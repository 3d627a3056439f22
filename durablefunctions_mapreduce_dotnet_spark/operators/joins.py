"""Join operators beyond plain equi-joins.

The reference has no joins at all (SURVEY.md §2.2 — verified absent), so
this surface is designed Spark-first: equi-joins ride Catalyst
(broadcast / sort-merge / shuffle-hash picked by AQE); the composite
operators below fill the gaps Spark lacks natively.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    payload: dict[str, str] | None = None,
    inner: bool = True,
) -> DataFrame:
    """As-of join: for each left row, the latest right row with
    ``right.ts <= left.ts`` and the same key.

    Spark has no native as-of join; a naive range-join explodes to
    O(|L|·|R|) per key.  This implementation unions both sides and runs
    one ordered window per key — a single shuffle on ``key``, linear
    work, no row explosion.  At 100 TB the hazard is key skew (one hot
    key serializes into one task); mitigate by pre-filtering time ranges
    or falling back to ``applyInPandas`` + ``pd.merge_asof`` per key
    bucket.

    payload: mapping of right-column -> output-column carried from the
    matched right row. Ties on (key, ts): the right row sorts before the
    left row so an equal timestamp matches (>= semantics, like
    ``pd.merge_asof`` / DuckDB ASOF JOIN).  Among right rows sharing
    (key, ts) the payload struct itself is the tie-break, so the carried
    payload is deterministic (the max payload wins) regardless of
    partition order.
    """
    payload = payload or {}
    lcols = [F.col(c) for c in left.columns]
    l = left.select(
        *lcols,
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        *[F.lit(None).cast(right.schema[src].dataType).alias(f"_p_{out}") for src, out in payload.items()],
    )
    r = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns],
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        *[F.col(src).alias(f"_p_{out}") for src, out in payload.items()],
    )
    tie = F.struct(*[F.col(f"_p_{out}") for out in payload.values()]) if payload else F.lit(0)
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_ts"), F.col("_side"), tie.asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # ONE packed struct carries matched_ts and every payload field
    # together: per-column last(ignorenulls) would skip back to an OLDER
    # right row whenever the matched row's payload value is NULL (and
    # could blend fields across tied rows) — merge_asof/ASOF semantics
    # return the matched row's values, NULLs included.
    packed = F.when(
        F.col("_side") == 0,
        F.struct(
            F.col("_ts").alias("_mts"),
            *[F.col(f"_p_{out}").alias(out) for out in payload.values()],
        ),
    )
    m = F.last(packed, ignorenulls=True).over(w)
    matched = l.unionByName(r).select(
        *left.columns,
        F.col("_side").alias("_side"),
        m["_mts"].alias("matched_ts"),
        *[m[out].alias(out) for out in payload.values()],
    )
    out = matched.where(F.col("_side") == 1).drop("_side")
    if inner:
        out = out.where(F.col("matched_ts").isNotNull())
    return out


def range_band_join(facts: DataFrame, bands: DataFrame, value_col: str, lo: str = "lo", hi: str = "hi") -> DataFrame:
    """Theta/range join of a fact table onto small [lo, hi) bands.

    Bands are dimension-sized: broadcast them so the join is a map-side
    nested-loop over a handful of rows — no shuffle of the fact side.
    (For large band tables, bucketize ``value_col`` and equi-join on the
    bucket id instead.)
    """
    return facts.join(
        F.broadcast(bands),
        (F.col(value_col) >= F.col(lo)) & (F.col(value_col) < F.col(hi)),
        "inner",
    )


def range_bin_join(
    facts: DataFrame,
    bands: DataFrame,
    value_col: str,
    lo: str = "lo",
    hi: str = "hi",
    bin_width: float = 100.0,
) -> DataFrame:
    """The LARGE-band-table path :func:`range_band_join` points at:
    ``facts.value IN [band.lo, band.hi)`` when the band side is far too
    big to broadcast and a nested loop would be O(|facts| x |bands|).

    Classic interval bucketization: pick a bin width, explode each band
    to one row per bin its interval overlaps, tag each fact with its
    single bin, EQUI-join on the bin id, then re-apply the exact range
    predicate as a residual filter.  Catalyst gets an ordinary shuffled
    equi-join (sort-merge / shuffle-hash, AQE-planned, skew-splittable)
    instead of a BroadcastNestedLoopJoin — both sides scale out.

    Cost model: band replication factor = interval_width / bin_width
    (+1), candidate pairs per fact = bands overlapping its bin.  Pick
    ``bin_width`` near the typical interval width; heavily-overlapping
    hot bins are ordinary join skew, handled by AQE or operators.skew.

    Duplicate-safe by construction: a (fact, band) pair meets in exactly
    one bin — the fact's own — so no post-join dedup is needed.
    """
    v = F.col(value_col)
    w = F.lit(bin_width)
    # [lo, hi) is half-open: when hi lands exactly on a bin boundary its
    # bin holds nothing from this band — ceil(hi/w)-1 excludes it (one
    # less dead replica per aligned band); greatest() keeps degenerate
    # hi <= lo bands from producing a descending sequence.
    lo_bin = F.floor(F.col(lo) / w).cast("long")
    hi_bin = F.greatest(lo_bin, F.ceil(F.col(hi) / w).cast("long") - 1)
    b = bands.withColumn("_bin", F.explode(F.sequence(lo_bin, hi_bin)))
    f = facts.withColumn("_bin", F.floor(v / w).cast("long"))
    return (
        f.join(b, "_bin")
        .where((v >= F.col(lo)) & (v < F.col(hi)))
        .drop("_bin")
    )
