"""Skew-resistant aggregation: two-level salted exact distinct count.

The reference never faces skew — its reducer receives N×7 doubles
(``Sample.cs:208-240``).  At 100 TB, ``COUNT(DISTINCT v) GROUP BY k``
is the classic skew bomb: every distinct value of a hot key must meet
in one reducer task, so a key holding 30% of the data turns one task
into the job's critical path.

The salted form partitions each key's *value space* by hash into
``buckets`` disjoint shards, counts distincts per (key, shard) — at
most 1/buckets of the hot key per task — then sums the shard counts.
Disjointness of the hash shards makes the two-level count EXACT, not
approximate, and both shuffles are plain hash exchanges AQE can size.
``approx_count_distinct`` (HLL++) is the cheaper one-shuffle answer
when ±2% error is acceptable (queries/aggregates_q.py); this is the
exact-answer scale path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_distinct_count(
    df: DataFrame,
    keys: list[str],
    value: str | Column,
    alias: str = "n_distinct",
    buckets: int = 32,
) -> DataFrame:
    """Exact ``COUNT(DISTINCT value) GROUP BY keys``, skew-proof.

    Level 1 groups by (keys, xxhash64(value) mod buckets): each hot key
    fans out over ``buckets`` reducer tasks, and a value's duplicates
    all land in the same shard, so per-shard ``count_distinct`` shards
    the true distinct set.  Level 2 sums shard counts per key — a tiny
    |keys|×buckets-row exchange.
    """
    v = F.col(value) if isinstance(value, str) else value
    shard = F.pmod(F.xxhash64(v), F.lit(buckets)).alias("_shard")
    return (
        df.groupBy(*keys, shard)
        .agg(F.count_distinct(v).alias("_nd"))
        .groupBy(*keys)
        .agg(F.sum("_nd").alias(alias))
    )


def salted_equi_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    spread_col: str,
    n_salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Fact-fact equi-join with hot-key salting — for the regime where
    NEITHER side fits broadcast and one key dominates, so a plain
    shuffle join serializes the hot key into one straggler task.

    The probe side's hot key is spread over ``n_salt`` sub-partitions by
    hashing ``spread_col`` (any column that varies within a key — a line
    number, an id); the build side replicates each row to all ``n_salt``
    salt values.  Joining on (key, salt) yields exactly the plain-join
    result (every (l, r) pair meets at precisely l's salt) while the hot
    key's work fans out n_salt-wide.  Build-side cost: n_salt× row
    replication — pick n_salt ≈ hot-key-share × tasks, and salt only
    the keys AQE's skew stats flag when replication is the bottleneck
    (AQE's own skew-join split handles sort-merge joins; this form also
    covers shuffle-hash joins and pre-AQE planners).

    The result is identical to ``left.join(right, key, how)`` for the
    probe-side-preserving join types (oracle-checked for inner:
    queries/joins_q.py: join_salted_skew).  ``right``/``full`` outer are
    REJECTED: the build side is replicated n_salt×, so every unmatched
    build row would be emitted n_salt times — use a plain join (with AQE
    skew handling) or swap the sides for those.
    """
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi",
               "leftsemi", "semi", "left_anti", "leftanti", "anti", "cross"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_equi_join: how={how!r} would duplicate unmatched "
            f"build-side rows n_salt={n_salt} times; allowed: inner/left/"
            "semi/anti (build side is replicated, probe side is not)"
        )
    salt = F.pmod(F.xxhash64(F.col(spread_col)), F.lit(n_salt))
    l = left.withColumn("_salt", salt)
    r = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    ).withColumn("_salt", F.col("_salt").cast("bigint"))
    return l.join(r, [key, "_salt"], how).drop("_salt")


def skew_report(
    df,
    key_cols: list[str],
    top_n: int = 10,
    n_quantiles: int = 4,
) -> "DataFrame":
    """Join/agg-key skew diagnostic — the measurement that decides
    between a plain shuffle, a broadcast, and a salted join BEFORE the
    job runs at 100 TB: per-key row counts summarized as one row of
    distribution statistics plus the ``top_n`` heaviest keys.

    Output (one row per heavy key, stats repeated — a flat frame a
    dashboard or a planner heuristic consumes directly):
    (key, key_count, n_keys, total_rows, max_count, avg_count_x100,
    skew_ratio_x100, rank).  ``skew_ratio_x100`` = 100·max/avg rounded
    to an integer — >300 is the usual "salt it" threshold; integer
    outputs keep the oracle hash-exact (the x100 fixed-point avoids FP
    division scaffolding).

    Plan: ONE combiner-reduced groupBy over the keys, then a tiny
    (distinct-key-sized) aggregate + top-k (``TakeOrderedAndProject``)
    — the diagnostic never reshuffles the corpus.

    NULL caveat: the composite key is ``concat_ws``-joined, which
    renders NULL components as empty strings — keys differing only in
    NULL-vs-'' collapse into one diagnostic bucket.  Acceptable for a
    DIAGNOSTIC (the skew magnitude is what matters); use null-safe
    struct keys if exact class identity is needed."""
    from pyspark.sql import functions as F

    key = F.concat_ws("|", *[F.col(c).cast("string") for c in key_cols])
    counts = df.groupBy(key.alias("key")).agg(F.count(F.lit(1)).alias("key_count"))
    stats = counts.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("key_count").alias("total_rows"),
        F.max("key_count").alias("max_count"),
    ).select(
        "n_keys",
        "total_rows",
        "max_count",
        F.floor(F.lit(100) * F.col("total_rows") / F.col("n_keys"))
        .cast("bigint")
        .alias("avg_count_x100"),
        F.floor(
            F.lit(100) * F.col("max_count") * F.col("n_keys") / F.col("total_rows")
        )
        .cast("bigint")
        .alias("skew_ratio_x100"),
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("key_count"), F.asc("key"))
    top = (
        counts.orderBy(F.desc("key_count"), F.asc("key"))
        .limit(top_n)
        .withColumn("rank", F.row_number().over(w).cast("bigint"))
    )
    return top.crossJoin(F.broadcast(stats)).select(
        "key",
        "key_count",
        "n_keys",
        "total_rows",
        "max_count",
        "avg_count_x100",
        "skew_ratio_x100",
        "rank",
    )
