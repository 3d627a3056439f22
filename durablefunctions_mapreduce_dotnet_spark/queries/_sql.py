"""Shared DuckDB-oracle SQL fragments mirroring functions.numeric."""


def dsum(x: str) -> str:
    """Order-independent SUM — mirror of ``functions.numeric.dsum``."""
    return f"CAST(SUM(CAST({x} AS DECIMAL(38,6))) AS DOUBLE)"


def davg(x: str) -> str:
    """Order-independent AVG — mirror of ``functions.numeric.davg``
    (nullif = Spark try_divide: all-NULL group -> NULL)."""
    return f"CAST(SUM(CAST({x} AS DECIMAL(38,6))) AS DOUBLE) / nullif(COUNT({x}), 0)"


def moments_sql(table: str, group: str, x: str, y: str) -> str:
    """Mirror of ``functions.numeric.grouped_moments``: two-pass centered
    variance/stddev/correlation with exact-decimal means and sums; FP is
    per-row only (order-free), so the result is engine-portable."""
    return f"""
WITH means AS (
  SELECT {group}, {davg(x)} AS _mux, {davg(y)} AS _muy
  FROM {table} GROUP BY {group}
), centered AS (
  SELECT t.{group},
         CAST(({x} - _mux) * ({x} - _mux) AS DECIMAL(38,6)) AS _dxx,
         CAST(({y} - _muy) * ({y} - _muy) AS DECIMAL(38,6)) AS _dyy,
         CAST(({x} - _mux) * ({y} - _muy) AS DECIMAL(38,6)) AS _dxy
  FROM {table} t JOIN means USING ({group})
)
SELECT {group},
       ROUND(CAST(SUM(_dxx) AS DOUBLE) / nullif(CAST(COUNT(*) AS DOUBLE) - 1.0, 0), 6) AS var_{x},
       ROUND(SQRT(CAST(SUM(_dyy) AS DOUBLE) / nullif(CAST(COUNT(*) AS DOUBLE) - 1.0, 0)), 6) AS sd_{y},
       ROUND(CAST(SUM(_dxy) AS DOUBLE)
         / nullif(SQRT(CAST(SUM(_dxx) AS DOUBLE)) * SQRT(CAST(SUM(_dyy) AS DOUBLE)), 0), 9) AS corr_xy
FROM centered GROUP BY {group}
"""


def regression_sql(table: str, group: str, x: str, y: str) -> str:
    """Mirror of ``functions.numeric.grouped_regression``: two-pass
    centered OLS with exact-decimal means/sums; only final divisions are
    floating-point."""
    return f"""
WITH means AS (
  SELECT {group}, {davg(x)} AS _mux, {davg(y)} AS _muy
  FROM {table} GROUP BY {group}
), centered AS (
  SELECT t.{group}, _mux, _muy,
         CAST(({x} - _mux) * ({x} - _mux) AS DECIMAL(38,6)) AS _dxx,
         CAST(({y} - _muy) * ({y} - _muy) AS DECIMAL(38,6)) AS _dyy,
         CAST(({x} - _mux) * ({y} - _muy) AS DECIMAL(38,6)) AS _dxy
  FROM {table} t JOIN means USING ({group})
), sums AS (
  SELECT {group}, ANY_VALUE(_mux) AS _mux, ANY_VALUE(_muy) AS _muy,
         CAST(SUM(_dxx) AS DOUBLE) AS _sxx,
         CAST(SUM(_dyy) AS DOUBLE) AS _syy,
         CAST(SUM(_dxy) AS DOUBLE) AS _sxy
  FROM centered GROUP BY {group}
)
SELECT {group},
       ROUND(_sxy / nullif(_sxx, 0), 9) AS slope,
       ROUND(_muy - (_sxy / nullif(_sxx, 0)) * _mux, 6) AS intercept,
       ROUND((_sxy * _sxy) / nullif(_sxx * _syy, 0), 9) AS r2
FROM sums
"""
