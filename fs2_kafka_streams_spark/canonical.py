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
    """Exact decimal view of a raw 2-dp double column, measure-guarded.

    The guard (``abs(x) < MEASURE_BOUND`` → else NULL) extends the
    events measure-domain policy to every money column: without it the
    cast is ENGINE-DIVERGENT on hostile input — Spark's ANSI
    double→decimal silently NULLs NaN/±inf but throws
    NUMERIC_VALUE_OUT_OF_RANGE on finite overflow, while DuckDB throws
    on all three (r10 non-finite-TPCH sweep, pinned in
    tests/test_review_r10_fixes.py). One vectorized comparison per row;
    identity on in-contract ≤2-dp data."""
    c = _c(col)
    return F.when(F.abs(c) < F.lit(MEASURE_BOUND), c).cast(DEC2)


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
    finite overflow. Since the r10 non-finite-TPCH sweep the same guard
    rides inside :func:`dec2` itself, so TPC-H money columns are covered
    uniformly (the unguarded cast was engine-divergent — see dec2)."""
    c = _c(col)
    return F.when(F.abs(c) < F.lit(bound), c)


def dsum(col: str | Column) -> Column:
    """Order-independent sum of a raw 2-dp double column, as double."""
    return F.sum(dec2(col)).cast("double")


def davg(col: str | Column) -> Column:
    """Order-independent mean of a raw 2-dp double column, as double.

    Mean over the MEASURE DOMAIN: the denominator counts the guarded
    value, so an out-of-domain row (NaN/±inf/overflow → NULL measure)
    is excluded from both numerator and denominator — a raw ``count(c)``
    would count NaN (non-NULL on both engines) while the guarded sum
    skipped it, silently deflating the mean."""
    c = _c(col)
    return F.sum(dec2(c)).cast("double") / F.count(dec2(c))


def dsum_expr(expr: Column) -> Column:
    """Sum of an already-decimal expression, as double."""
    return F.sum(expr).cast("double")


def revenue_expr(price: str = "l_extendedprice", disc: str = "l_discount") -> Column:
    """The TPC-H revenue expression, computed exactly in decimal."""
    return dec2(price) * (F.lit(1) - dec2(disc))


# ---- DuckDB-side mirrors -------------------------------------------------

def sql_dec2(expr: str) -> str:
    """Oracle mirror of :func:`dec2` — measure-guarded decimal view."""
    return (
        f"cast((CASE WHEN abs({expr}) < 1e14 THEN {expr} END)"
        " as decimal(18,2))"
    )


# the (1 - disc) factor is widened to DECIMAL(19,2): width >= 19 is
# hugeint-backed in DuckDB, so the product runs in int128 — the plain
# DECIMAL(18) x DECIMAL(20) multiply executes in int64 and throws
# OutOfRange once |price x (1-disc)| scaled passes 2^63 (r11 fuzz,
# seed 9: in-measure-domain +/-9.99e13 money values). 18+20 = 38 keeps
# the result inside DuckDB's max width; Spark's own widening caps at
# (38,4) the same way.
SQL_REVENUE = (
    f"{sql_dec2('l_extendedprice')}"
    f" * (1 - cast({sql_dec2('l_discount')} as decimal(19,2)))"
)


def sql_measure(expr: str, bound: str = "1e14") -> str:
    """Oracle mirror of :func:`measure` (same portable abs-bound)."""
    return f"(CASE WHEN abs({expr}) < {bound} THEN {expr} END)"


def sql_dsum(expr: str) -> str:
    # via text (spelled `string` — the one alias BOTH parsers accept;
    # Spark rejects bare `varchar`, and q49b runs this helper's output
    # through spark.sql verbatim): DuckDB's hugeint-backed
    # DECIMAL(38,2) -> DOUBLE cast
    # is incorrectly rounded once the scaled sum exceeds 2^53 (int128 /
    # then divide; 99900000029099.03 -> .05), while the text parse is
    # correctly rounded and matches Spark's BigDecimal.doubleValue
    # (r11 fuzz, seed 8)
    return f"cast(cast(sum({sql_dec2(expr)}) as string) as double)"


def sql_davg(expr: str) -> str:
    """Oracle mirror of :func:`davg` — measure-domain mean (the count is
    over the guarded value, excluding out-of-domain rows)."""
    return (
        f"cast(cast(sum({sql_dec2(expr)}) as string) as double)"
        f" / count({sql_dec2(expr)})"
    )


def sql_dsum_expr(expr: str) -> str:
    """Sum of an already-decimal SQL expression, as double."""
    return f"cast(cast(sum({expr}) as string) as double)"


# ---- Arrow-collectable timestamp saturation --------------------------------
#
# The driver collects results through Arrow/pandas, whose timestamp unit
# is NANOSECONDS: a COMPUTED time bound (window end = bucket + width,
# session end = last ts + gap) for an event within one window-length of
# the ns range crosses 2262-04-11 23:47:16.854775 / 1677-09-21
# 00:12:43.145225 and crashes the us->ns cast at collection, while the
# DuckDB twin returns the us value happily (r11 fuzz, seed 6 — the same
# boundary the r10 far-date sweep hit on month TRUNCATION, fixed there
# by collecting DATEs). Raw event timestamps are always collectable
# (they were READ through the same us parquet), so only computed bounds
# need the clamp. Saturation, not NULL: the window identity is its
# grouping key (the raw bucket — entries clamp in the PROJECTION only),
# and a saturated bound states "past the representable range" without
# losing the row.

ARROW_TS_MAX = "2262-04-11 23:47:16.854775"
ARROW_TS_MIN = "1677-09-21 00:12:43.145225"


def clamp_ts(col: str | Column, ts_type: str = "timestamp_ntz") -> Column:
    """Saturate a computed time bound into the Arrow-ns-representable
    range (identity for every collectable value)."""
    c = _c(col)
    return F.least(
        F.greatest(c, F.lit(ARROW_TS_MIN).cast(ts_type)),
        F.lit(ARROW_TS_MAX).cast(ts_type),
    )


def sql_clamp_ts(expr: str) -> str:
    """Oracle mirror of :func:`clamp_ts`."""
    return (
        f"least(greatest({expr}, TIMESTAMP '{ARROW_TS_MIN}'),"
        f" TIMESTAMP '{ARROW_TS_MAX}')"
    )


def sql_json_strict(expr: str) -> str:
    """Oracle mirror of Spark's STRICT JSON validity (try_parse_json):
    DuckDB's yyjson leniently accepts bare NaN/Infinity number tokens
    that Spark's parser rejects (r11 fuzz, seed 10: '{"k": NaN}' was
    good on DuckDB, a dead letter on Spark). Exact encoding: normalize
    (json() — strings re-escaped, whitespace dropped), BLANK OUT every
    string literal, then any remaining NaN/Infinity text must be a bare
    token. NULL propagates (counts in neither DLQ bucket, like Spark)."""
    norm = f"json({expr})::VARCHAR"
    no_strings = (
        f"regexp_replace({norm}, '\"(?:[^\"\\\\]|\\\\.)*\"', '\"\"', 'g')"
    )
    # CASE, not AND: json() THROWS on invalid input, so the normalize
    # branch must be unreachable unless json_valid already passed
    return (
        f"(CASE WHEN {expr} IS NULL THEN NULL"
        f" WHEN NOT json_valid({expr}) THEN FALSE"
        # coalesce: a literal-null doc normalizes to SQL NULL
        # (json('null')::VARCHAR) but IS strict — Spark parses it to a
        # non-null variant
        f" ELSE NOT coalesce("
        f"regexp_matches({no_strings}, 'NaN|Infinity'), FALSE) END)"
    )
