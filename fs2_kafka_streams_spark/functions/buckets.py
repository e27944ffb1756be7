"""Monotone time-bucket expression shared by the skew-bounded operators.

The bucketed as-of join (``operators/asof_join.py``) and the SCD2
salt-window-stitch (``operators/scd.py``) both split a per-key window sort
into per-(key, bucket) sorts; this is their one bucket function, so their
bucket boundaries (and the tests' expectations) can never drift apart.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import DateType, TimestampNTZType, TimestampType


def quoted_col(name: str) -> Column:
    """``F.col`` over a backtick-quoted column NAME (embedded backticks
    escaped): callers pass arbitrary names (spaces, dots, reserved words)
    and a bare ``F.col(name)`` would misparse or misbind a dotted name as
    a struct-field reference. One helper so every name-taking entry point
    in the bucketed/salted family quotes the same way."""
    return F.col("`" + name.replace("`", "``") + "`")


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
        # backtick-quote the user's column name (see quoted_col) — here
        # the name is interpolated into a SQL string, so quote inline
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
    return F.floor(quoted_col(col) / F.lit(spec))


def bucket_width_report(
    df,
    order_col: str,
    spec: str | int | float,
    key_cols: Sequence[str] = (),
    warn: bool = True,
) -> dict:
    """Width-sanity report for the bucketed plans (VERDICT r8 #7): ONE
    aggregation over the (key, bucket) groups the plan would create,
    summarized to a one-line verdict — run it on a sample/yesterday's
    partition BEFORE committing a width, the same do-it-once posture as
    ``operators/joins.py::detect_hot_keys``.

    The equality properties hold for ANY width (tests/test_asof_bucketed
    .py, tests/test_scd_history.py), but the COST does not:

    - a width spanning the whole time range puts every row in one bucket
      — the plan silently degenerates to the unbucketed sort PLUS the
      stitch/carry overhead;
    - a width near the event spacing puts every row in its own bucket —
      the O(keys × buckets) stitch/carry summary approaches O(rows) and
      the extra joins dominate (SCALE.md "Round-8 bucketed variants"
      crossover table).

    Returns ``{rows, groups, buckets, max_group_rows, avg_group_rows,
    warning}``; ``warning`` is also emitted via ``warnings.warn`` unless
    ``warn=False``. Healthy shape: ``max_group_rows`` bounded by what one
    task can sort in memory, with ``avg_group_rows`` well above 1.
    """
    import warnings as _w

    bucket = time_bucket_expr(
        df.schema[order_col].dataType, spec, order_col
    )
    groups = df.groupBy(
        *[quoted_col(k) for k in key_cols], bucket.alias("_b")
    ).agg(F.count(F.lit(1)).alias("_n"))
    row = groups.agg(
        F.sum("_n").alias("rows"),
        F.count(F.lit(1)).alias("groups"),
        F.countDistinct("_b").alias("buckets"),
        F.max("_n").alias("max_group_rows"),
    ).collect()[0]
    rows, n_groups = int(row["rows"] or 0), int(row["groups"] or 0)
    rep = {
        "rows": rows,
        "groups": n_groups,
        "buckets": int(row["buckets"] or 0),
        "max_group_rows": int(row["max_group_rows"] or 0),
        "avg_group_rows": round(rows / n_groups, 2) if n_groups else 0.0,
        "warning": None,
    }
    if rows:
        if rep["buckets"] <= 1:
            rep["warning"] = (
                f"bucket width {spec!r} puts ALL {rows} rows in one "
                "bucket: the bucketed plan degenerates to the unbucketed "
                "sort plus stitch/carry overhead — narrow the width"
            )
        elif n_groups > 0.5 * rows:
            rep["warning"] = (
                f"bucket width {spec!r} yields {n_groups} groups for "
                f"{rows} rows (avg {rep['avg_group_rows']} rows/group): "
                "the stitch/carry summary approaches O(rows) and its "
                "joins dominate — widen the width"
            )
    if rep["warning"] and warn:
        _w.warn(rep["warning"], stacklevel=2)
    return rep
