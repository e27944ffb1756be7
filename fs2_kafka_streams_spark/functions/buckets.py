"""Monotone time-bucket expression shared by the skew-bounded operators.

The bucketed as-of join (``operators/asof_join.py``) and the SCD2
salt-window-stitch (``operators/scd.py``) both split a per-key window sort
into per-(key, bucket) sorts; this is their one bucket function, so their
bucket boundaries (and the tests' expectations) can never drift apart.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import DateType, TimestampNTZType, TimestampType


def time_bucket_expr(dtype, spec: str | int | float, col: str) -> Column:
    """``floor(col / width)`` as a Column, for a timestamp/date column with
    a duration-string ``spec`` ("1 hour") or a numeric column with a
    numeric width. Monotone in the column value — all the bucketed
    operators need; absolute bucket alignment is irrelevant to their
    correctness.

    Timestamps and dates go through ``timestampdiff`` against an NTZ epoch
    literal: ``unix_micros`` and numeric casts reject TIMESTAMP_NTZ, while
    ``timestampdiff`` accepts both timestamp flavors and DATE (a date
    reads as its midnight, so DATE and timestamp sides of an as-of join
    bucket on the same scale) and is timezone-independent for NTZ.
    Pre-epoch values go negative and ``floor`` keeps the bucketing
    monotone.
    """
    if isinstance(spec, str):
        if not isinstance(dtype, (TimestampType, TimestampNTZType, DateType)):
            raise ValueError(
                "string time_bucket needs a timestamp or date time column; "
                f"pass a numeric width for {dtype.simpleString()}"
            )
        from fs2_kafka_streams_spark.streaming.conf import duration_us

        width = duration_us(spec)
        # backtick-quote the user's column name (escaping embedded
        # backticks) — callers pass arbitrary names (spaces, dots,
        # reserved words) and an unquoted interpolation would misparse
        # or misbind as a struct-field reference
        quoted = "`" + col.replace("`", "``") + "`"
        return F.floor(
            F.expr(
                "timestampdiff(MICROSECOND, "
                f"timestamp_ntz'1970-01-01 00:00:00', {quoted})"
            )
            / F.lit(width)
        )
    if isinstance(dtype, (TimestampType, TimestampNTZType, DateType)):
        raise ValueError(
            "numeric time_bucket needs a numeric time column; pass a "
            "duration string for timestamps/dates"
        )
    return F.floor(F.col(col) / F.lit(spec))
