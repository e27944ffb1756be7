"""Portable hashing: identical values in Spark and DuckDB.

Engine-native hashes (xxhash64, duckdb hash()) differ between engines, so
any hashed artifact that must match an oracle uses a 60-bit integer derived
from an md5 prefix — md5 is bit-identical everywhere.

Verified: ``conv(substr(md5('hello'),1,15),16,10)`` (Spark) ==
``('0x'||substr(md5('hello'),1,15))::BIGINT`` (DuckDB) == 419982666956583591.

For pure-Spark hot paths where no oracle is involved (MinHash at scale),
prefer ``F.xxhash64`` — JVM-side, no md5 cost.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_int64(col: Column) -> Column:
    """60-bit non-negative integer hash, identical in Spark and DuckDB."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def SQL_MD5_INT64(expr: str) -> str:
    """DuckDB mirror of :func:`md5_int64`."""
    return f"(('0x' || substr(md5({expr}), 1, 15))::BIGINT)"


def md5_int64_hi(col: Column) -> Column:
    """Second independent 60-bit word from the same md5 (hex chars 16-30) —
    used when one 60-bit word isn't enough (e.g. the 64-bit portable
    SimHash needs 64 independent bits)."""
    return F.conv(F.substring(F.md5(col), 16, 15), 16, 10).cast("bigint")


def SQL_MD5_INT64_HI(expr: str) -> str:
    """DuckDB mirror of :func:`md5_int64_hi`."""
    return f"(('0x' || substr(md5({expr}), 16, 15))::BIGINT)"
