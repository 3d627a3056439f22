"""Vector math over ``array<double>`` columns — pure Catalyst expressions.

Everything here stays JVM-side (higher-order functions, no Python UDFs):
``aggregate`` folds left-to-right, so dot products are sequential sums —
deterministic, and bit-identical to an oracle that sums in the same
order.  Inputs stored as ``array<float>`` are widened exactly to double
first.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(vec: Column | str) -> Column:
    v = F.col(vec) if isinstance(vec, str) else vec
    return F.transform(v, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product: sum_i a[i]*b[i], left to right."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def l2_norm(v: Column) -> Column:
    return F.sqrt(dot(v, v))


def cosine(a: Column, b: Column, norm_a: Column, norm_b: Column) -> Column:
    """Cosine from precomputed norms (precompute once per row, not per pair)."""
    return dot(a, b) / (norm_a * norm_b)
