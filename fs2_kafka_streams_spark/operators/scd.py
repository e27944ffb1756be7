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
    order_bucket: str | int | float | None = None,
) -> DataFrame:
    """SCD2 history of a keyed changelog.

    Returns one row per non-tombstone write with ``valid_from``,
    ``valid_to`` (NULL = still current) and ``is_current``. When
    ``tombstone_col`` (a boolean column) is given, tombstone writes close
    the preceding version but emit no row.

    ``order_col`` must be unique per key (Kafka offsets are; for event
    time, disambiguate upstream, e.g. a (ts, id)-derived column) —
    otherwise ``lead`` over tied rows is nondeterministic. NULL orders
    COUNT toward that uniqueness: at most one NULL-order row per key
    (NULLs tie in the sort like any duplicate, and in the bucketed plan
    a tied-NULL ``lead`` result is additionally indistinguishable from
    end-of-slice, so the two plans may break the tie differently —
    probed in tests/test_scd_history.py).

    ``order_bucket`` selects the SKEW-BOUNDED salt-window-stitch plan: a
    duration string ("1 hour") for a timestamp ``order_col``, a numeric
    width for a numeric one. The default plan sorts each key's entire
    changelog in ONE window partition — unsplittable under a hot key. The
    stitched plan windows per (key, time-bucket) — time-contiguous
    slices, so ``lead`` within a slice is already the true next write for
    every row except the slice's LAST, whose ``valid_to`` is stitched
    from a second, tiny window over the O(keys × buckets) per-slice
    first-write summary (the next non-empty slice's first order value —
    tombstone or not, exactly what ``lead`` would have seen). Equality
    with the unbucketed plan is pinned in tests/test_scd_history.py.
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
    dead = (
        # coalesce NULL→False: a nullable flag set only on tombstones
        # must not drop its live rows (filter(~NULL) removes the row);
        # same convention as incremental.apply_changes
        F.coalesce(F.col(tombstone_col).cast("boolean"), F.lit(False))
        if tombstone_col is not None
        else F.lit(False)
    ).alias("_dead")

    if order_bucket is None:
        w = Window.partitionBy(*key_cols).orderBy(F.col(order_col).asc())
        out = df.select(
            *[F.col(k) for k in key_cols],
            *[F.col(c) for c in value_cols],
            F.col(order_col).alias("valid_from"),
            F.lead(order_col).over(w).alias("valid_to"),
            dead,
        )
        return (
            out.filter(~F.col("_dead"))
            .drop("_dead")
            .withColumn("is_current", F.col("valid_to").isNull())
        )

    # ---- salt-window-stitch (skew-bounded) plan ---------------------------
    from fs2_kafka_streams_spark.functions.buckets import time_bucket_expr

    reserved = {"_b", "_vt_local"}
    clash_b = reserved & (set(value_cols) | set(key_cols))
    if clash_b:
        raise ValueError(
            "changelog_history reserves column name(s) "
            f"{sorted(reserved)} in the bucketed plan; rename the "
            f"conflicting input column(s) {sorted(clash_b)}"
        )
    bucket = time_bucket_expr(
        df.schema[order_col].dataType, order_bucket, order_col
    )
    keys = [F.col(k) for k in key_cols]
    sliced = df.select(
        *keys, *[F.col(c) for c in value_cols],
        F.col(order_col), dead, bucket.alias("_b"),
    )
    # within a time-contiguous slice, lead() is already correct for all
    # but the slice's last row
    w_slice = Window.partitionBy(*key_cols, "_b").orderBy(
        F.col(order_col).asc()
    )
    local = sliced.withColumn("_vt_local", F.lead(order_col).over(w_slice))
    # stitch: per (key, slice) the FIRST write (min order — tombstones
    # included, since lead() would see them too); the slice's last row
    # closes at the next non-empty slice's first write
    firsts = sliced.groupBy(*key_cols, "_b").agg(
        F.min(order_col).alias("_first")
    )
    w_stitch = Window.partitionBy(*key_cols).orderBy(F.col("_b").asc())
    nexts = firsts.select(
        *keys, "_b", F.lead("_first").over(w_stitch).alias("_next_first")
    )
    # NULL-SAFE stitch join: the window path groups NULL keys (and a NULL
    # order's NULL bucket) into partitions like any other value — a plain
    # equi-join would silently drop their history rows
    loc, nx = local.alias("_L"), nexts.alias("_N")
    cond = None
    for k in list(key_cols) + ["_b"]:
        c = F.col(f"_L.{k}").eqNullSafe(F.col(f"_N.{k}"))
        cond = c if cond is None else cond & c
    out = loc.join(nx, on=cond, how="left").select(
        *[F.col(f"_L.{k}").alias(k) for k in key_cols],
        *[F.col(f"_L.{c}").alias(c) for c in value_cols],
        F.col(f"_L.{order_col}").alias("valid_from"),
        F.coalesce(F.col("_L._vt_local"), F.col("_N._next_first")).alias(
            "valid_to"
        ),
        F.col("_L._dead").alias("_dead"),
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
