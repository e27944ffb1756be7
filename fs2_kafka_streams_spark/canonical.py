"""Canonicalization helpers for deterministic cross-engine comparison.

Every declared query must hash-match a DuckDB oracle, so float handling must
be bit-identical between Spark and DuckDB. Three facts drive the design:

1. **Summation order differs** (Spark partial aggregation vs DuckDB scan
   order) → double sums differ in the last ulps.
2. **`round(double, n)` semantics differ**: Spark rounds the shortest
   decimal representation, DuckDB the exact binary value.
3. **double→decimal casts of *computed* values differ too** (verified:
   36378.064999999995 → 36378.06 in Spark, 36378.07 in DuckDB).

The one safe conversion: double→decimal of a **raw stored column**. Every
double column in the test tables carries exactly ≤2 decimal digits
(verified at sf0.1), so `cast(x as decimal(18,2))` is unambiguous — both
engines recover the same exact decimal. Therefore:

  **Convert raw columns to decimal first; do ALL arithmetic in decimal;
  cast to double only as the final output step.**

Decimal arithmetic is exact and associative → identical results regardless
of partitioning, on both engines, with no rounding ties.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC2 = "decimal(18,2)"


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dec2(col: str | Column) -> Column:
    """Exact decimal view of a raw 2-dp double column."""
    return _c(col).cast(DEC2)


#: Exact-decimal measure domain bound: |x| below this fits DECIMAL(18,2)
#: and BIGINT cents with orders of magnitude to spare.
MEASURE_BOUND = 1e14


def measure(col: str | Column, bound: float = MEASURE_BOUND) -> Column:
    """The measure-domain view of an event metric column: values outside
    the exact-decimal domain (NaN, ±inf, |x| >= bound) become NULL — the
    SQL reading of "no usable measurement" — instead of engine-divergent
    cast behavior (Spark ANSI throws CAST_OVERFLOW, DuckDB throws
    ConversionException, non-ANSI Spark silently NULLs: three different
    outcomes for the same row; r10 extreme-numerics sweep).

    ONE portable predicate covers all four hostile classes: ``abs(x) <
    bound`` is false for NaN on both engines (IEEE comparison semantics;
    Spark's NaN-greatest ordering agrees), false for ±inf, and false for
    finite overflow. TPC-H money columns keep the module's documented
    ≤2-dp precondition and stay on the unguarded fast path."""
    c = _c(col)
    return F.when(F.abs(c) < F.lit(bound), c)


def dsum(col: str | Column) -> Column:
    """Order-independent sum of a raw 2-dp double column, as double."""
    return F.sum(dec2(col)).cast("double")


def davg(col: str | Column) -> Column:
    """Order-independent mean of a raw 2-dp double column, as double."""
    c = _c(col)
    return F.sum(dec2(c)).cast("double") / F.count(c)


def dsum_expr(expr: Column) -> Column:
    """Sum of an already-decimal expression, as double."""
    return F.sum(expr).cast("double")


def revenue_expr(price: str = "l_extendedprice", disc: str = "l_discount") -> Column:
    """The TPC-H revenue expression, computed exactly in decimal."""
    return dec2(price) * (F.lit(1) - dec2(disc))


# ---- DuckDB-side mirrors -------------------------------------------------

SQL_REVENUE = (
    "cast(l_extendedprice as decimal(18,2))"
    " * (1 - cast(l_discount as decimal(18,2)))"
)


def sql_dec2(expr: str) -> str:
    return f"cast({expr} as decimal(18,2))"


def sql_measure(expr: str, bound: str = "1e14") -> str:
    """Oracle mirror of :func:`measure` (same portable abs-bound)."""
    return f"(CASE WHEN abs({expr}) < {bound} THEN {expr} END)"


def sql_dsum(expr: str) -> str:
    return f"cast(sum(cast({expr} as decimal(18,2))) as double)"


def sql_davg(expr: str) -> str:
    return f"cast(sum(cast({expr} as decimal(18,2))) as double) / count({expr})"


def sql_dsum_expr(expr: str) -> str:
    """Sum of an already-decimal SQL expression, as double."""
    return f"cast(sum({expr}) as double)"
