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
