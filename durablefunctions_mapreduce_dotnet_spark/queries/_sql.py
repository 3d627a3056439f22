"""Shared DuckDB-oracle SQL fragments mirroring functions.numeric."""


def dsum(x: str) -> str:
    """Order-independent SUM — mirror of ``functions.numeric.dsum``."""
    return f"CAST(SUM(CAST({x} AS DECIMAL(38,6))) AS DOUBLE)"


def davg(x: str) -> str:
    """Order-independent AVG — mirror of ``functions.numeric.davg``."""
    return f"CAST(SUM(CAST({x} AS DECIMAL(38,6))) AS DOUBLE) / COUNT({x})"
