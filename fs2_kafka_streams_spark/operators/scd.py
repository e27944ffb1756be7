"""Changelog → versioned history (SCD type 2) — the time-travel view of the
reference's table materialization.

``latest_by_key`` folds a changelog to its head (the reference's
``Map[K, V]`` table, ``streams/Tables.scala:46-70``); this operator keeps
every version, stamping each with its validity interval:

- ``valid_from`` = the row's own changelog order (timestamp/offset);
- ``valid_to`` = the next write to the same key (NULL while current);
- a tombstone (``respect_tombstones`` in the table facade, reference
  delete semantics ``Table.scala:52-56``) closes the previous version's
  interval and contributes no version row of its own;
- ``is_current`` marks the open interval, so
  ``history.filter("is_current")`` equals ``latest_by_key`` minus deleted
  keys (asserted in tests/test_scd_history.py).

Scale shape: one shuffle on the key, then a per-key ``lead`` window. Unlike
the latest-by-key aggregate (O(distinct keys) shuffle), history inherently
materializes O(rows) output, and the window sorts only within a key's
changelog — the partition-by-key shuffle is the operator's floor at any
scale. No Python in the plan; whole-stage codegen throughout.

``as_of(history, ts)`` gives the point-in-time snapshot — the batch
analogue of seeking a consumer to an old offset and re-folding
(reference offset recovery, ``client/Consumer.scala``).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def changelog_history(
    df: DataFrame,
    key_cols: Sequence[str],
    order_col: str,
    value_cols: Sequence[str] | None = None,
    tombstone_col: str | None = None,
) -> DataFrame:
    """SCD2 history of a keyed changelog.

    Returns one row per non-tombstone write with ``valid_from``,
    ``valid_to`` (NULL = still current) and ``is_current``. When
    ``tombstone_col`` (a boolean column) is given, tombstone writes close
    the preceding version but emit no row.

    ``order_col`` must be unique per key (Kafka offsets are; for event
    time, disambiguate upstream, e.g. a (ts, id)-derived column) —
    otherwise ``lead`` over tied rows is nondeterministic.
    """
    if value_cols is None:
        reserved = set(key_cols) | {order_col, tombstone_col}
        value_cols = [c for c in df.columns if c not in reserved]
    taken = {"valid_from", "valid_to", "is_current", "_dead"}
    clash = taken & set(value_cols)
    if clash:
        # a payload column with one of the emitted names would produce a
        # duplicate-named select and fail later with AMBIGUOUS_REFERENCE —
        # fail here, at the API boundary, with the actionable message
        raise ValueError(
            f"changelog_history emits columns {sorted(taken)}; rename the "
            f"conflicting input column(s) {sorted(clash)} or exclude them "
            "via value_cols"
        )
    w = Window.partitionBy(*key_cols).orderBy(F.col(order_col).asc())
    out = df.select(
        *[F.col(k) for k in key_cols],
        *[F.col(c) for c in value_cols],
        F.col(order_col).alias("valid_from"),
        F.lead(order_col).over(w).alias("valid_to"),
        (
            # coalesce NULL→False: a nullable flag set only on tombstones
            # must not drop its live rows (filter(~NULL) removes the row);
            # same convention as incremental.apply_changes
            F.coalesce(F.col(tombstone_col).cast("boolean"), F.lit(False))
            if tombstone_col is not None
            else F.lit(False)
        ).alias("_dead"),
    )
    return (
        out.filter(~F.col("_dead"))
        .drop("_dead")
        .withColumn("is_current", F.col("valid_to").isNull())
    )


def as_of(history: DataFrame, at: Column) -> DataFrame:
    """Point-in-time snapshot of an SCD2 history: versions whose interval
    covers ``at`` (``valid_from <= at < valid_to``, open current intervals
    included). Catalyst folds the two comparisons into the parquet scan
    filters when the history is stored partitioned/sorted by time."""
    return history.filter(
        (F.col("valid_from") <= at)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > at))
    ).drop("valid_to", "is_current")
