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

    DuckDB-oracle equivalent:
    ``CAST(SUM(CAST(x AS DECIMAL(38,6))) AS DOUBLE) / COUNT(x)``
    """
    c = F.col(col) if isinstance(col, str) else col
    out = F.sum(c.cast(DECIMAL)).cast("double") / F.count(c)
    return out.alias(alias) if alias else out
