"""Partitioning-invariance properties for the scale-path operators:
the same answer must come back no matter how the input is split
(SURVEY.md §5.2.4)."""

from __future__ import annotations

from pyspark.sql import functions as F

from durablefunctions_mapreduce_dotnet_spark.operators.skew import (
    salted_distinct_count,
)
from durablefunctions_mapreduce_dotnet_spark.sources.readers import read_table

from .conftest import SF_DIR


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_salted_distinct_matches_exact_under_any_partitioning(spark):
    e = read_table(spark, SF_DIR, "events")
    exact = _rows(
        e.groupBy("event_type").agg(F.count_distinct("user_id").alias("n_users"))
    )
    for parts in (1, 7, 32):
        got = _rows(
            salted_distinct_count(
                e.repartition(parts), ["event_type"], "user_id", alias="n_users"
            )
        )
        assert got == exact, f"parts={parts}"


def test_salted_distinct_bucket_count_irrelevant(spark):
    e = read_table(spark, SF_DIR, "events")
    base = _rows(salted_distinct_count(e, ["event_type"], "user_id", buckets=2))
    for buckets in (1, 8, 101):
        assert (
            _rows(salted_distinct_count(e, ["event_type"], "user_id", buckets=buckets))
            == base
        ), f"buckets={buckets}"


def test_udaf_weighted_avg_partition_invariant(spark):
    """The grouped-agg pandas UDF sums int64 cents, so shuffling the
    row order inside each group batch must not move a single bit."""
    from durablefunctions_mapreduce_dotnet_spark.queries.udf_q import (
        _wavg_price,
        q_udaf_weighted_avg,
    )

    base = _rows(q_udaf_weighted_avg(spark, SF_DIR))
    li = read_table(spark, SF_DIR, "lineitem").repartition(13, "l_partkey")
    shuffled = _rows(
        li.groupBy("l_returnflag")
        .agg(_wavg_price("l_extendedprice", "l_quantity").alias("wavg_price"))
        .orderBy("l_returnflag")
    )
    assert shuffled == base


def test_bucketed_join_is_shuffle_free(spark):
    """Co-located join: both sides bucketed+sorted on the join key must
    sort-merge-join with ZERO exchanges — the 100 TB recipe for a
    repeatedly-joined fact/dim pair.  (Managed tables land in the local
    spark-warehouse; dropped after.)"""
    from durablefunctions_mapreduce_dotnet_spark.plans import explain_str

    li = read_table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_extendedprice")
    o = read_table(spark, SF_DIR, "orders").select("o_orderkey", "o_totalprice")
    try:
        (
            li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
            .mode("overwrite").saveAsTable("li_bucketed")
        )
        (
            o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
            .mode("overwrite").saveAsTable("o_bucketed")
        )
        j = (
            spark.table("li_bucketed")
            .hint("merge")  # keep SMJ even under the broadcast threshold
            .join(
                spark.table("o_bucketed"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
        )
        plan = explain_str(j, "simple")
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, plan
        # and it still computes the right thing
        assert j.count() == li.join(o, li.l_orderkey == o.o_orderkey).count()
    finally:
        spark.sql("DROP TABLE IF EXISTS li_bucketed")
        spark.sql("DROP TABLE IF EXISTS o_bucketed")


def test_time_rollup_open_close_tie_stable(spark):
    """Struct-extrema open/close must be identical under repartition —
    bare first()/min_by would not be."""
    from durablefunctions_mapreduce_dotnet_spark.queries.timeseries_q import (
        q_time_rollup_ohlc,
    )

    base = _rows(q_time_rollup_ohlc(spark, SF_DIR))
    # second run over a differently-split source
    e = read_table(spark, SF_DIR, "events").repartition(17)
    first = F.min(F.struct("ts", "event_id", "value"))
    last = F.max(F.struct("ts", "event_id", "value"))
    got = _rows(
        e.groupBy(
            F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(38,6)")).cast("double").alias("volume"),
            F.min("value").alias("low"),
            F.max("value").alias("high"),
            first["value"].alias("open_v"),
            last["value"].alias("close_v"),
        )
        .orderBy("day", "event_type")
    )
    assert got == base


def test_salted_join_rejects_build_duplicating_how(spark):
    """ADVICE r2: right/full outer would emit unmatched build rows
    n_salt times — the operator must refuse, not silently duplicate."""
    import pytest

    from durablefunctions_mapreduce_dotnet_spark.operators.skew import (
        salted_equi_join,
    )

    l = spark.range(5).select(F.col("id").alias("k"), F.col("id").alias("s"))
    r = spark.range(5).select(F.col("id").alias("k"))
    for how in ("right", "right_outer", "full", "outer", "full_outer"):
        with pytest.raises(ValueError, match="salted_equi_join"):
            salted_equi_join(l, r, "k", "s", n_salt=4, how=how)
    # probe-preserving forms still work and match the plain join
    for how in ("inner", "left", "left_semi", "left_anti"):
        got = _rows(salted_equi_join(l, r, "k", "s", n_salt=4, how=how))
        want = _rows(l.join(r, "k", how))
        assert got == want, how


def test_sessionize_missing_tiebreak_raises(spark):
    import pytest

    from durablefunctions_mapreduce_dotnet_spark.operators.windows import (
        sessionize,
    )

    e = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00")], "user_id bigint, ts string"
    ).select("user_id", F.col("ts").cast("timestamp").alias("ts"))
    with pytest.raises(ValueError, match="tie-break"):
        sessionize(e, id_col="event_id")
    # explicit opt-out is allowed
    assert sessionize(e, id_col=None).count() == 1


def test_distribution_rank_keeps_null_lead_rows_first(spark):
    """ADVICE r2: NULL lead-order values must be RANKED (nulls first,
    Spark ASC default), not dropped via a NULL bucket id."""
    from durablefunctions_mapreduce_dotnet_spark.operators.windows import (
        global_distribution_rank,
    )

    df = spark.createDataFrame(
        [(None, 1), (5.0, 2), (None, 3), (1.0, 4), (9.0, 5)],
        "v double, id bigint",
    )
    got = global_distribution_rank(df, ["v", "id"], ntile_k=2)
    rows = {r["id"]: r["_rn"] for r in got.collect()}
    assert len(rows) == 5  # no row loss
    # NULLs first by id tie-break, then values ascending
    assert rows == {1: 1, 3: 2, 4: 3, 2: 4, 5: 5}


def test_asof_payload_is_atomic_with_matched_row(spark):
    """merge_asof/ASOF semantics: the payload comes from THE matched
    right row — a NULL payload there must surface as NULL, not be
    backfilled from an older right row."""
    from durablefunctions_mapreduce_dotnet_spark.operators.joins import (
        asof_join_backward,
    )

    left = spark.createDataFrame([(1, 3)], "k long, ts long")
    right = spark.createDataFrame(
        [(1, 1, "old"), (1, 2, None)], "k long, ts long, val string"
    )
    row = asof_join_backward(
        left, right, "k", "ts", "ts", payload={"val": "r_val"}
    ).first()
    assert row["matched_ts"] == 2
    assert row["r_val"] is None  # NOT "old"


def test_flagship_counts_zero_valid_row_files_in_denominator(spark, tmp_path):
    """A listed file whose every row fails validity still contributes 7
    zero buckets (Sample.cs:119,196-199): one valid Sunday trip at speed
    10 in a.csv + header-only b.csv must average (10+0)/2 = 5."""
    from durablefunctions_mapreduce_dotnet_spark.operators.flagship import (
        flagship_trips,
    )
    from durablefunctions_mapreduce_dotnet_spark.sources.trips import (
        list_csv_files,
        read_trips_csv_faithful,
    )

    hdr = "VendorID," + ",".join(f"c{i}" for i in range(16))
    (tmp_path / "a.csv").write_text(
        hdr + "\n1,2017-01-01 00:00:00,2017-01-01 01:00:00,1,10.0"
        + ",x" * 12 + "\n"
    )
    (tmp_path / "b.csv").write_text(hdr + "\n")
    glob = str(tmp_path / "*.csv")
    out = {
        r["dow"]: r["avg_speed"]
        for r in flagship_trips(
            read_trips_csv_faithful(spark, glob), files=list_csv_files(spark, glob)
        ).collect()
    }
    assert out[0] == 5.0  # Sunday: (10 + 0) / 2 files
    assert out[1] == 0.0


def test_grouped_moments_degenerate_groups_yield_null(spark):
    """A single-row group (n-1 = 0) or zero-variance group must produce
    NULL statistics, not an ANSI DIVIDE_BY_ZERO job abort."""
    from durablefunctions_mapreduce_dotnet_spark.functions.numeric import (
        grouped_moments,
    )

    df = spark.createDataFrame(
        [("one", 1.0, 2.0), ("flat", 3.0, 5.0), ("flat", 3.0, 5.0)],
        "k string, x double, y double",
    )
    got = {r["k"]: r for r in grouped_moments(df, ["k"], "x", "y").collect()}
    assert got["one"]["var_x"] is None and got["one"]["corr_xy"] is None
    assert got["flat"]["var_x"] == 0.0 and got["flat"]["corr_xy"] is None


def test_grouped_regression_matches_numpy(spark):
    """OLS slope/intercept/r2 must agree with numpy's lstsq fit to ~1e-6
    relative (exact-decimal path vs float64 reference), and degenerate
    zero-x-variance groups must yield NULL, not an ANSI abort."""
    import numpy as np

    from durablefunctions_mapreduce_dotnet_spark.functions.numeric import (
        grouped_regression,
    )

    rng = np.random.RandomState(11)
    xs = rng.uniform(0, 1000, 200)
    ys = 3.25 * xs - 41.5 + rng.normal(0, 5.0, 200)
    rows = [("g", float(x), float(y)) for x, y in zip(xs, ys)] + [
        ("flat", 7.0, 1.0),
        ("flat", 7.0, 2.0),
    ]
    df = spark.createDataFrame(rows, "k string, x double, y double")
    got = {r["k"]: r for r in grouped_regression(df, ["k"], "x", "y").collect()}
    slope, icpt = np.polyfit(xs, ys, 1)
    r = np.corrcoef(xs, ys)[0, 1]
    assert abs(got["g"]["slope"] - slope) < 1e-6 * abs(slope)
    assert abs(got["g"]["intercept"] - icpt) < 1e-4 * abs(icpt)
    assert abs(got["g"]["r2"] - r * r) < 1e-6
    assert got["flat"]["slope"] is None and got["flat"]["r2"] is None


def _asof_both_paths(spark, left_rows, right_rows, skew_keys, bucket_seconds, inner):
    from durablefunctions_mapreduce_dotnet_spark.operators.joins import (
        asof_join_backward,
    )

    left = spark.createDataFrame(left_rows, "k long, ts long, lval long")
    right = spark.createDataFrame(right_rows, "k long, ts long, val string")
    kw = dict(payload={"val": "r_val"}, inner=inner)

    def rows(df):  # None-safe sort (NULL keys / NULL matches)
        return sorted((tuple(r) for r in df.collect()), key=repr)

    plain = rows(asof_join_backward(left, right, "k", "ts", "ts", **kw))
    skew = rows(
        asof_join_backward(
            left, right, "k", "ts", "ts",
            skew_keys=skew_keys, skew_bucket_seconds=bucket_seconds, **kw,
        )
    )
    return plain, skew


def test_asof_skew_path_matches_window_path(spark):
    """A deliberately hot key (100 rows both sides over many buckets,
    matches reaching across bucket boundaries, ties at bucket starts)
    must produce the window path's answer bit-for-bit, inner and outer."""
    left_rows, right_rows = [], []
    # hot key 1: left every 7s, right every 13s over [0, 700)
    left_rows += [(1, t, t) for t in range(0, 700, 7)]
    right_rows += [(1, t, f"h{t}") for t in range(0, 700, 13)]
    # left rows far beyond the last right row: carry-in must reach over
    # many EMPTY buckets
    left_rows += [(1, 5000, 5000), (1, 9999, 9999)]
    # left rows at exact bucket starts (bucket_seconds=50) tie semantics
    left_rows += [(1, 50, 50), (1, 100, 100)]
    right_rows += [(1, 100, "tie")]
    # left row before any right row: NULL match (outer) / dropped (inner)
    left_rows += [(1, -10, -10)]
    # cold keys with their own data
    left_rows += [(2, t, t) for t in range(0, 100, 11)]
    right_rows += [(2, t, f"c{t}") for t in range(3, 100, 17)]
    # key only on the left / only on the right
    left_rows += [(3, 42, 42)]
    right_rows += [(4, 42, "orphan")]
    for inner in (True, False):
        plain, skew = _asof_both_paths(
            spark, left_rows, right_rows, skew_keys=[1], bucket_seconds=50, inner=inner
        )
        assert skew == plain, f"inner={inner}"
        assert len(plain) > 0


def test_asof_skew_path_keeps_null_keys_and_tie_breaks(spark):
    """NULL keys must survive the hot/cold split (isin() is NULL-valued
    for them), and the max-payload tie-break among same-(key, ts) right
    rows must hold on the bucketed path too."""
    left_rows = [(None, 10, 10), (1, 10, 10)]
    right_rows = [(None, 5, "nullkey"), (1, 5, "a"), (1, 5, "z"), (1, 4, "m")]
    plain, skew = _asof_both_paths(
        spark, left_rows, right_rows, skew_keys=[1], bucket_seconds=3, inner=False
    )
    assert skew == plain
    by_k = {r[0]: r for r in skew}
    assert by_k[None][-1] == "nullkey"
    assert by_k[1][-1] == "z"  # max payload wins the (k, ts) tie
