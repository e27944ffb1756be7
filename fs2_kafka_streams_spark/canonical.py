"""Canonicalization helpers for deterministic cross-engine comparison.

Every declared query must hash-match a DuckDB oracle. Floating-point
aggregation is order-dependent (Spark's partial aggregation sums doubles in
task order), so aggregates over doubles are computed in DECIMAL (exact,
associative) and only cast back to double at the end. Round-tripping through
``decimal(18,4)`` is lossless for the 2-decimal money-like values in the test
tables and makes Spark and DuckDB produce bit-identical sums regardless of
partitioning.

Pattern per aggregate (mirrored in the oracle SQL):
  sum:  round(cast(sum(cast(x as decimal(18,4))) as double), 2)
  avg:  round(cast(sum(cast(x as decimal(18,4))) as double) / count(x), 2)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(18,4)"


def dsum(col: str | Column, scale: int = 2) -> Column:
    """Order-independent sum of a double column, rounded to ``scale``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(F.sum(c.cast(DEC)).cast("double"), scale)


def davg(col: str | Column, scale: int = 2) -> Column:
    """Order-independent mean of a double column, rounded to ``scale``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(F.sum(c.cast(DEC)).cast("double") / F.count(c), scale)


def sql_dsum(expr: str, scale: int = 2) -> str:
    """DuckDB-side mirror of :func:`dsum`."""
    return f"round(cast(sum(cast({expr} as decimal(18,4))) as double), {scale})"


def sql_davg(expr: str, scale: int = 2) -> str:
    """DuckDB-side mirror of :func:`davg`."""
    return (
        f"round(cast(sum(cast({expr} as decimal(18,4))) as double)"
        f" / count({expr}), {scale})"
    )
