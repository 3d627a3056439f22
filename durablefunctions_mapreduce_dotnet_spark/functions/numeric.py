"""Exact, order-independent numeric aggregation helpers.

Floating-point sums are not associative, so a parallel engine (Spark's
partial/final HashAggregate) and a serial oracle (DuckDB) can disagree
in the low-order bits — and the reference itself is nondeterministic
for exactly this reason (unsynchronized ``Parallel.For`` reduction,
``Sample.cs:218-224``).  Our engine must be deterministic, so money- and
measure-typed sums go through a fixed-scale DECIMAL: per-row cast is a
deterministic rounding, decimal addition is exact and associative, and
the final cast back to double is deterministic.  Result: bit-identical
aggregates regardless of partitioning, and hash-equal to the oracle.

Cost note (100 TB): Spark decimals ≤ 18 digits ride a compact long;
wider precisions use BigDecimal.  This is the standard OLAP trade
(TPC-H specifies DECIMAL for money); counts/min/max/integer-valued
sums stay plain doubles/longs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: fixed scale for exact sums — 6 fractional digits covers the 2-dp
#: synthetic money/measure columns with headroom.
DECIMAL = "decimal(38,6)"


def dsum(col: Column | str, alias: str | None = None) -> Column:
    """Order-independent SUM for fractional doubles: sum(cast decimal) → double.

    DuckDB-oracle equivalent:
    ``CAST(SUM(CAST(x AS DECIMAL(38,6))) AS DOUBLE)``
    """
    c = F.col(col) if isinstance(col, str) else col
    out = F.sum(c.cast(DECIMAL)).cast("double")
    return out.alias(alias) if alias else out


def davg(col: Column | str, alias: str | None = None) -> Column:
    """Order-independent AVG: exact decimal sum / count, divided as double.
    ``try_divide``: an all-NULL group (count 0) yields NULL instead of an
    ANSI DIVIDE_BY_ZERO abort.

    DuckDB-oracle equivalent:
    ``CAST(SUM(CAST(x AS DECIMAL(38,6))) AS DOUBLE) / nullif(COUNT(x), 0)``
    """
    c = F.col(col) if isinstance(col, str) else col
    out = F.try_divide(F.sum(c.cast(DECIMAL)).cast("double"), F.count(c))
    return out.alias(alias) if alias else out


# Statistical moments are TWO-PASS and centered: pass 1 computes the
# exact-decimal mean per group; pass 2 sums per-row centered products
# cast to decimal.  Every FP step is per-row and order-free (double
# subtract/multiply, one deterministic decimal rounding per row), and
# all additive accumulation is exact decimal — so results are
# bit-identical under any partitioning AND across engines.  The naive
# one-pass n·Σx²−(Σx)² form is NOT portable: the giant power sums
# overflow Spark's 38-digit decimal cap (silent scale reduction) and
# its double form is FMA-contraction-dependent (observed: DuckDB vs
# JVM differ by ulps).  Centering is also the numerically right call —
# no catastrophic cancellation.  Mirrors: ``_sql.moments_sql``.


def grouped_moments(
    df,
    group_cols: list[str],
    x: str,
    y: str,
):
    """Per-group (var_samp(x), stddev_samp(y), corr(x, y)) — deterministic.

    Returns a DataFrame with group_cols + var_<x>, sd_<y>, corr columns.
    Two aggregations over the input with a broadcast join of the tiny
    per-group means in between — the second pass re-uses the same
    shuffle key, and at 100 TB the means side is |groups| rows.
    """
    cx, cy = F.col(x), F.col(y)
    means = df.groupBy(*group_cols).agg(
        davg(cx, "_mux"), davg(cy, "_muy")
    )
    j = df.join(F.broadcast(means), group_cols)
    ctr_x = cx - F.col("_mux")
    ctr_y = cy - F.col("_muy")
    return (
        j.select(
            *group_cols,
            (ctr_x * ctr_x).cast(DECIMAL).alias("_dxx"),
            (ctr_y * ctr_y).cast(DECIMAL).alias("_dyy"),
            (ctr_x * ctr_y).cast(DECIMAL).alias("_dxy"),
        )
        .groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.sum("_dxx").cast("double").alias("_sxx"),
            F.sum("_dyy").cast("double").alias("_syy"),
            F.sum("_dxy").cast("double").alias("_sxy"),
        )
        .select(
            *group_cols,
            # Final stats are rounded (6/9 dp): the per-row double→decimal
            # cast rounds the shortest string repr on the JVM but the
            # binary value in C++ engines, so the exact sums can differ
            # by an ulp on borderline rows — rounding absorbs that last
            # bit while keeping 6+ significant digits of the statistic.
            # try_divide: a single-row group (n-1 = 0) or zero-variance
            # group (corr denominator 0) yields NULL — ANSI mode would
            # otherwise abort the whole job on one degenerate group.
            F.round(
                F.try_divide(F.col("_sxx"), F.col("_n").cast("double") - F.lit(1.0)), 6
            ).alias(f"var_{x}"),
            F.round(
                F.sqrt(
                    F.try_divide(F.col("_syy"), F.col("_n").cast("double") - F.lit(1.0))
                ),
                6,
            ).alias(f"sd_{y}"),
            F.round(
                F.try_divide(
                    F.col("_sxy"), F.sqrt(F.col("_sxx")) * F.sqrt(F.col("_syy"))
                ),
                9,
            ).alias("corr_xy"),
        )
    )


def grouped_regression(
    df,
    group_cols: list[str],
    x: str,
    y: str,
):
    """Per-group least-squares line of ``y`` on ``x`` — the
    REGR_SLOPE / REGR_INTERCEPT / REGR_R2 family, deterministic.

    Same two-pass centered machinery as :func:`grouped_moments` (exact
    decimal means, per-row centered products cast to fixed-scale
    decimal, exact additive accumulation): slope = Sxy/Sxx,
    intercept = μy − slope·μx, r² = Sxy²/(Sxx·Syy).  The built-in
    ``regr_*`` aggregates in both engines accumulate doubles
    order-dependently and cross-engine FMA-differently — this form is
    bit-stable under any partitioning and hash-equal to the oracle.
    ``try_divide`` nulls degenerate groups (zero x-variance) instead of
    an ANSI abort.  Mirrors: ``_sql.regression_sql``.
    """
    cx, cy = F.col(x), F.col(y)
    means = df.groupBy(*group_cols).agg(
        davg(cx, "_mux"), davg(cy, "_muy")
    )
    j = df.join(F.broadcast(means), group_cols)
    ctr_x = cx - F.col("_mux")
    ctr_y = cy - F.col("_muy")
    sums = (
        j.select(
            *group_cols,
            "_mux",
            "_muy",
            (ctr_x * ctr_x).cast(DECIMAL).alias("_dxx"),
            (ctr_y * ctr_y).cast(DECIMAL).alias("_dyy"),
            (ctr_x * ctr_y).cast(DECIMAL).alias("_dxy"),
        )
        .groupBy(*group_cols)
        .agg(
            F.first("_mux").alias("_mux"),
            F.first("_muy").alias("_muy"),
            F.sum("_dxx").cast("double").alias("_sxx"),
            F.sum("_dyy").cast("double").alias("_syy"),
            F.sum("_dxy").cast("double").alias("_sxy"),
        )
    )
    slope = F.try_divide(F.col("_sxy"), F.col("_sxx"))
    return sums.select(
        *group_cols,
        F.round(slope, 9).alias("slope"),
        F.round(F.col("_muy") - slope * F.col("_mux"), 6).alias("intercept"),
        F.round(
            F.try_divide(
                F.col("_sxy") * F.col("_sxy"), F.col("_sxx") * F.col("_syy")
            ),
            9,
        ).alias("r2"),
    )
