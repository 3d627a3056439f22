"""Join operators beyond plain equi-joins.

The reference has no joins at all (SURVEY.md §2.2 — verified absent), so
this surface is designed Spark-first: equi-joins ride Catalyst
(broadcast / sort-merge / shuffle-hash picked by AQE); the composite
operators below fill the gaps Spark lacks natively.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    payload: dict[str, str] | None = None,
    inner: bool = True,
    skew_keys: list | None = None,
    skew_bucket_seconds: float = 86_400.0,
    tolerance: float | None = None,
) -> DataFrame:
    """As-of join: for each left row, the latest right row with
    ``right.ts <= left.ts`` and the same key.

    ``tolerance`` (pandas ``merge_asof(tolerance=)`` semantics): a match
    staler than this is discarded — NULLed when ``inner=False``, the
    row dropped when ``inner=True``.  Units are seconds for timestamp
    columns, the column's own units for integer timestamps (the
    ``skew_bucket_seconds`` convention).  The max-staleness guard every
    production feature-store lookup needs: without it a backward as-of
    happily joins a year-old reference row.

    Spark has no native as-of join; a naive range-join explodes to
    O(|L|·|R|) per key.  This implementation unions both sides and runs
    one ordered window per key — a single shuffle on ``key``, linear
    work, no row explosion.  At 100 TB the hazard is key skew: one hot
    key serializes into one window task.  Pass ``skew_keys`` (found by a
    cheap ``groupBy(key).count()`` probe, or known a priori) to route
    those keys through the time-bucketed path — partition the hot key's
    timeline into ``skew_bucket_seconds`` buckets, compute each bucket's
    carry-in (the winning right row from all earlier buckets) with a
    per-(key, bucket) aggregate + a tiny per-key range-frame window over
    bucket ids, then run the SAME ordered window per (key, bucket).  A
    hot key then parallelizes across its time buckets; results are
    bit-identical to the plain path (tests/test_joins_asof_skew.py).

    payload: mapping of right-column -> output-column carried from the
    matched right row. Ties on (key, ts): the right row sorts before the
    left row so an equal timestamp matches (>= semantics, like
    ``pd.merge_asof`` / DuckDB ASOF JOIN).  Among right rows sharing
    (key, ts) the payload struct itself is the tie-break, so the carried
    payload is deterministic (the max payload wins) regardless of
    partition order.
    """
    payload = payload or {}
    l = _asof_tag_left(left, right, key, left_ts, payload)
    r = _asof_tag_right(left, right, key, right_ts, payload)
    if skew_keys:
        hot = F.col("_k").isin(list(skew_keys))
        # NULL keys: isin() is NULL-valued, so ~hot alone would drop
        # them from BOTH branches — route them cold explicitly (the
        # plain window groups NULL keys as their own partition).
        is_cold = ~hot | F.col("_k").isNull()
        cold = _asof_window(l.where(is_cold), r.where(is_cold), left.columns, payload, ["_k"])
        hot_out = _asof_bucketed(
            l.where(hot), r.where(hot), left.columns, payload, skew_bucket_seconds
        )
        out = cold.unionByName(hot_out)
    else:
        out = _asof_window(l, r, left.columns, payload, ["_k"])
    if tolerance is not None:
        t_l = dict(left.dtypes)[left_ts]
        lc, mc = F.col(left_ts), F.col("matched_ts")
        if t_l in ("timestamp", "timestamp_ntz"):
            dist = F.unix_micros(lc.cast("timestamp")) - F.unix_micros(
                mc.cast("timestamp")
            )
            lim = F.lit(float(tolerance) * 1_000_000.0)
        else:
            dist = lc.cast("double") - mc.cast("double")
            lim = F.lit(float(tolerance))
        out = out.withColumn("_stale", mc.isNotNull() & (dist > lim))
        for c in ["matched_ts", *payload.values()]:
            out = out.withColumn(
                c, F.when(F.col("_stale"), F.lit(None)).otherwise(F.col(c))
            )
        out = out.drop("_stale")
    if inner:
        out = out.where(F.col("matched_ts").isNotNull())
    return out


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    payload: dict[str, str] | None = None,
    inner: bool = True,
    skew_keys: list | None = None,
    skew_bucket_seconds: float = 86_400.0,
    tolerance: float | None = None,
) -> DataFrame:
    """Forward as-of join: for each left row, the EARLIEST right row with
    ``right.ts >= left.ts`` and the same key (DuckDB ``ASOF JOIN ... ON
    l.ts <= r.ts`` / ``pd.merge_asof(direction='forward')`` semantics,
    equal timestamps match).

    Implemented as :func:`asof_join_backward` on NEGATED integer
    timestamps — time reversal maps "earliest at-or-after" onto "latest
    at-or-before" exactly, ties included: the backward winner among
    equal scan positions is ``max(struct(ts, payload))``, and on negated
    micros equal negts reduce that to max payload, while distinct negts
    pick max(-ts) = min real ts.  One battle-tested window core serves
    both directions, and the hot-key bucketed fallback (``skew_keys``)
    comes along for free: reversed-time buckets take their carry-in from
    what is, in real time, the LATER buckets — which is precisely the
    forward join's correctness requirement
    (tests/test_analytics_linkage.py::test_asof_forward_skew_path).

    ``matched_ts`` is returned in the right side's timestamp dtype;
    NULL timestamps never match (NULL negates to NULL, preserving the
    backward path's nulls-first no-match handling).
    """
    t_l = dict(left.dtypes)[left_ts]
    t_r = dict(right.dtypes)[right_ts]

    def neg(df: DataFrame, col: str, dtype: str):
        c = F.col(col)
        if dtype in ("timestamp", "timestamp_ntz"):
            c = F.unix_micros(c.cast("timestamp"))
        return df.withColumn("_fwd_negts", (-c).cast("long"))

    # backward buckets on _ts.cast(double): the seconds-denominated width
    # must match the negated grid — micros when neg() converted a
    # timestamp, the column's own units when it was already integer
    # (otherwise buckets come out 1e6× too wide and the hot-key
    # parallelization silently collapses to one bucket).
    ts_scale = 1_000_000.0 if t_l in ("timestamp", "timestamp_ntz") else 1.0
    out = asof_join_backward(
        neg(left, left_ts, t_l),
        neg(right, right_ts, t_r),
        key,
        left_ts="_fwd_negts",
        right_ts="_fwd_negts",
        payload=payload,
        inner=inner,
        skew_keys=skew_keys,
        skew_bucket_seconds=skew_bucket_seconds * ts_scale,
        # negated-micros distance == real forward distance, same scale
        tolerance=None if tolerance is None else tolerance * ts_scale,
    )
    matched = -F.col("matched_ts")
    if t_r in ("timestamp", "timestamp_ntz"):
        matched = F.timestamp_micros(matched)
    else:
        matched = matched.cast(right.schema[right_ts].dataType)
    return out.withColumn("matched_ts", matched).drop("_fwd_negts")


def _asof_tag_left(left, right, key, left_ts, payload):
    return left.select(
        *[F.col(c) for c in left.columns],
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        *[F.lit(None).cast(right.schema[src].dataType).alias(f"_p_{out}") for src, out in payload.items()],
    )


def _asof_tag_right(left, right, key, right_ts, payload):
    return right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns],
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        *[F.col(src).alias(f"_p_{out}") for src, out in payload.items()],
    )


def _asof_window(l, r, left_cols, payload, part_cols):
    """The union-both-sides ordered-window core, partitioned on
    ``part_cols`` (plain path: [_k]; skew path: [_k, _bucket]).
    Serves BOTH directions: the forward join feeds it negated integer
    timestamps, so the ascending scan is always correct here."""
    tie = F.struct(*[F.col(f"_p_{out}") for out in payload.values()]) if payload else F.lit(0)
    w = (
        Window.partitionBy(*part_cols)
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
        *left_cols,
        F.col("_side").alias("_side"),
        m["_mts"].alias("matched_ts"),
        *[m[out].alias(out) for out in payload.values()],
    )
    return matched.where(F.col("_side") == 1).drop("_side")


def _asof_bucketed(l, r, left_cols, payload, bucket_seconds):
    """Hot-key as-of: shard each key's timeline into time buckets so the
    per-key window becomes a per-(key, bucket) window.

    Correctness hinges on the carry-in: a left row's match may live in an
    earlier bucket, so each bucket is seeded with the WINNING right row
    (max (ts, payload) struct — exactly the window path's tie-break) from
    all strictly-earlier buckets.  That winner is computed from
    per-(key, bucket) aggregates (combiner-reduced, ≤ one row per
    (key, bucket)) and propagated with a range-frame window ordered by
    bucket id — O(#buckets) rows per key, not O(data).  A carry-in row's
    ts is strictly below its bucket's start, so it sorts before every
    in-bucket row and can never steal a tie.  NULL-ts rows keep bucket
    NULL and sort into their own shard, matching the plain path's
    nulls-first grouping.
    """
    bucket = F.floor(F.col("_ts").cast("double") / F.lit(float(bucket_seconds))).cast("long")
    lb = l.withColumn("_bucket", bucket)
    rb = r.withColumn("_bucket", bucket)
    win_struct = F.struct(
        F.col("_ts").alias("_mts"),
        *[F.col(f"_p_{out}").alias(out) for out in payload.values()],
    )
    ragg = rb.groupBy("_k", "_bucket").agg(F.max(win_struct).alias("_s"))
    markers = (
        lb.select("_k", "_bucket")
        .distinct()
        .withColumn("_s", F.lit(None).cast(ragg.schema["_s"].dataType))
    )
    wb = (
        Window.partitionBy("_k")
        .orderBy("_bucket")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    carry = (
        ragg.select("_k", "_bucket", "_s")
        .unionByName(markers)
        .withColumn("_c", F.max("_s").over(wb))
        # markers are exactly the NULL-_s rows (ragg structs are never
        # NULL: F.struct of a non-empty group is non-null)
        .where(F.col("_s").isNull() & F.col("_c").isNotNull())
    )
    carry_rows = carry.select(
        *[F.lit(None).cast(lb.schema[c].dataType).alias(c) for c in left_cols],
        F.col("_k"),
        F.col("_c")["_mts"].alias("_ts"),
        F.lit(0).alias("_side"),
        *[F.col("_c")[out].alias(f"_p_{out}") for out in payload.values()],
        F.col("_bucket"),
    )
    return _asof_window(
        lb, rb.unionByName(carry_rows), left_cols, payload, ["_k", "_bucket"]
    )


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


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    payload: dict[str, str] | None = None,
    inner: bool = True,
) -> DataFrame:
    """Nearest as-of join: for each left row, the right row with the same
    key whose timestamp is CLOSEST in either direction
    (``pd.merge_asof(direction='nearest')``); equidistant candidates
    resolve to the at-or-before row, matching pandas.

    Composition, not a third window machine: run the backward pass,
    thread its outputs through the forward pass as ordinary carried
    columns, then arbitrate per row on integer-microsecond distances.
    Cost is exactly two directional joins — two key exchanges, since
    each pass unions a fresh copy of the right side (which breaks the
    first pass's co-partitioning) — with no row explosion in either.
    Output adds ``matched_ts`` + payload columns exactly like the
    directional joins.
    """
    payload = payload or {}
    b_payload = {src: f"_b_{out}" for src, out in payload.items()}
    f_payload = {src: f"_f_{out}" for src, out in payload.items()}
    back = asof_join_backward(
        left, right, key, left_ts, right_ts, payload=b_payload, inner=False
    ).withColumnRenamed("matched_ts", "_b_ts")
    both = asof_join_forward(
        back, right, key, left_ts, right_ts, payload=f_payload, inner=False
    ).withColumnRenamed("matched_ts", "_f_ts")

    def us(c):
        col = F.col(c)
        return F.unix_micros(col.cast("timestamp")) if dict(both.dtypes)[c] in (
            "timestamp",
            "timestamp_ntz",
        ) else col.cast("long")

    d_b = us(left_ts) - us("_b_ts")
    d_f = us("_f_ts") - us(left_ts)
    use_b = F.col("_b_ts").isNotNull() & (F.col("_f_ts").isNull() | (d_b <= d_f))
    out = both.select(
        *left.columns,
        F.when(use_b, F.col("_b_ts")).otherwise(F.col("_f_ts")).alias("matched_ts"),
        *[
            F.when(use_b, F.col(f"_b_{o}")).otherwise(F.col(f"_f_{o}")).alias(o)
            for o in payload.values()
        ],
    )
    if inner:
        out = out.where(F.col("matched_ts").isNotNull())
    return out


def bloom_filter_build(
    build: DataFrame, key: str, log2_m: int = 18, k: int = 3
) -> list[int]:
    """Build a deterministic Bloom filter over ``build[key]`` as a list
    of ``2^log2_m / 64`` long words — the distributed, bounded-driver
    form of what Spark's runtime bloom join
    (``spark.sql.optimizer.runtime.bloomFilter.enabled``) does opaquely.

    The 100 TB shape: the k bit positions are computed row-side
    (``xxhash64(key, seed)`` — JVM codegen, no Python), then OR-folded
    into words by a combiner-reduced ``groupBy(word_idx).agg(bit_or)``
    — the driver collects at most ``m/64`` (word, bits) rows no matter
    how large the build side is.  A 2^18-bit filter is 32 KiB: it
    broadcasts where a 10M-key hash relation would not, which is the
    whole trade — prefilter the probe side's shuffle down to
    ~selectivity + FPP before the exact join.

    False-positive rate ~ (1 - e^(-k*n/m))^k; positives are removed by
    the exact join that follows, so correctness never depends on the
    filter (the oracle for any query using this is the plain join).
    """
    m = 1 << log2_m
    hashes = F.array(
        *[F.pmod(F.xxhash64(F.col(key), F.lit(i)), F.lit(m)) for i in range(k)]
    )
    words = (
        build.select(F.explode(hashes).alias("p"))
        .select(
            F.expr("p div 64").alias("widx"),
            F.expr("shiftleft(1L, CAST(p % 64 AS INT))").alias("bit"),
        )
        .groupBy("widx")
        .agg(F.bit_or("bit").alias("w"))
        .collect()
    )
    out = [0] * (m // 64)
    for r in words:
        out[r["widx"]] = r["w"]
    return out


def bloom_might_contain(
    words: list[int], key: str, log2_m: int = 18, k: int = 3
) -> Column:
    """Row predicate: every one of the k bloom bits for ``key`` is set.

    ``words`` rides into the plan as ONE array<long> literal (data, not
    expression tree — 4096 longs at log2_m=18), the bit masks as a
    64-long lookup literal (the Python ``shiftleft`` wrapper only takes
    literal shift amounts, so shift-by-column is replaced by
    ``element_at(masks, p % 64 + 1)``), and the test is pure
    whole-stage-codegen arithmetic on the probe side: no shuffle, no
    Python, evaluated map-side before any exchange.  NULL keys hash
    like any value and simply fail/pass the bits; an inner join after
    discards them either way.

    Both literals are built with ONE ``F.expr`` parse each rather than
    ``F.lit(list)``: the list form creates one py4j round-trip per
    element (~2.7 s of pure driver time for 4096 longs — measured), the
    parsed form ~6 ms, for an identical ``array<long>`` literal in the
    plan.  Long literals carry the ``L`` suffix; Spark's parser accepts
    the full signed-long range including LONG_MIN."""
    m = 1 << log2_m

    def _arr(vals: "list[int]") -> Column:
        return F.expr("array(" + ",".join(f"{v}L" for v in vals) + ")")

    arr = _arr(list(words))
    # two's-complement wrap for bit 63: python 1<<63 exceeds signed long
    masks = _arr([(1 << b) - (1 << 64 if b == 63 else 0) for b in range(64)])
    cond = F.lit(True)
    for i in range(k):
        p = F.pmod(F.xxhash64(F.col(key), F.lit(i)), F.lit(m))
        word = F.element_at(arr, (p / F.lit(64)).cast("int") + 1)
        mask = F.element_at(masks, F.pmod(p, F.lit(64)).cast("int") + 1)
        cond = cond & (word.bitwiseAND(mask) != 0)
    return cond
