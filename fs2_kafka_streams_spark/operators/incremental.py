"""Incremental table maintenance: apply a change-batch onto a snapshot.

The reference materializes a table by folding the WHOLE changelog through
an upsert map (``streams/Tables.scala:46-70``); recovery re-reads from the
last committed offset, not from offset zero (``streams/Table.scala:64-95``:
the store persists the highest applied offset). This operator is that
recovery contract as a batch MERGE: given the snapshot at offset X and the
changes after X, produce the snapshot at the new head — WITHOUT rescanning
the log prefix. At 100 TB the prefix is the 100 TB; the delta is a day.

Semantics (last-write-wins, reference ``Table.scala:52-56``):

- a key only in the snapshot passes through unchanged;
- a key in the delta takes the delta's LAST write (greatest ``order_col``);
- a delta whose last write for a key is a tombstone DELETES the key —
  including keys the snapshot never saw (delete of a missing key is a
  no-op, matching map semantics);
- the output records the key's last applied ``order_col`` (the reference
  persists exactly this watermark per store).

Plan shape: one ``latest_by_key`` aggregation over the delta (O(delta)
shuffle) + one full-outer join on the key against the snapshot. The join
shuffles O(snapshot keys + delta keys) — independent of the log length.
With both sides bucketed by key (``operators/joins.py::write_bucketed``)
even that shuffle disappears. No Python anywhere in the plan.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fs2_kafka_streams_spark.operators.latest_by_key import latest_by_key


def apply_changes(
    snapshot: DataFrame | None,
    changes: DataFrame,
    key_cols: Sequence[str],
    order_col: str,
    value_cols: Sequence[str],
    tombstone_col: str | None = None,
    keep_tombstones: bool = False,
    unique_order: bool = True,
) -> DataFrame:
    """Merge ``changes`` onto ``snapshot`` with last-write-wins per key.

    PRECONDITION (default ``unique_order=True``): ``order_col`` is UNIQUE
    per key within a change batch — a changelog position (Kafka offset,
    LSN), which is what the reference folds (``Table.scala:52-56``). The
    ``>=`` merge boundary below relies on this for idempotent re-apply,
    and the within-batch aggregation skips the value tiebreak. If your
    batches may carry ties (e.g. same-timestamp updates from different
    producers), pass ``unique_order=False``: the within-batch winner is
    then deterministic (greatest value tuple breaks the tie) instead of
    whichever row the aggregation happened to see last — but note the
    snapshot-vs-delta boundary still resolves an exact order tie in the
    delta's favor.

    ``snapshot`` columns: ``key_cols + value_cols + [order_col]`` (as
    produced by a previous ``apply_changes`` — pass ``None`` to fold a
    changelog from scratch). ``changes`` is raw changelog rows with the
    same key/value/order columns plus the optional boolean
    ``tombstone_col``.

    The merge is ORDER-AWARE: a delta row older (by ``order_col``) than
    the snapshot's recorded position for its key loses, so an overlapping
    or late-delivered change-batch cannot regress a value. With the
    default ``keep_tombstones=False`` the output holds live rows only —
    the offset-driven recovery contract, where batches never overlap and
    a tombstone's position need not be remembered. Event-time chained
    merges (batches MAY overlap) should pass ``keep_tombstones=True``:
    the output then retains one marker row per dead key (``tombstone_col``
    kept in the schema, flag true) so a later batch's OLDER record loses
    to the tombstone instead of resurrecting the key — the same kept
    marker the streaming engines hold in state
    (``streaming/stateful.py``); filter ``~tombstone_col`` for the
    live view.
    """
    reserved = (
        {"_dead", "_s_dead", "_d_present"}
        | {f"_d_{c}" for c in list(value_cols) + [order_col]}
        | {f"_dk_{k}" for k in key_cols}
    )
    clash = reserved & (
        set(key_cols) | set(value_cols) | {order_col, tombstone_col}
    )
    if clash:
        # an input column named like the merge's internal slots would be
        # silently overwritten (snapshot=None path) or fail later with
        # AMBIGUOUS_REFERENCE — reject at the boundary with the names
        # (same convention as scd.changelog_history)
        raise ValueError(
            f"apply_changes reserves column name(s) {sorted(clash)}; "
            "rename the conflicting input column(s)"
        )
    keep = list(value_cols) + [order_col]
    if tombstone_col is not None:
        keep = keep + [tombstone_col]
    # with the documented unique-order precondition the aggregation skips
    # the value-struct tiebreak state; unique_order=False restores the
    # deterministic greatest-value tiebreak for tie-capable batches
    delta = latest_by_key(
        changes, key_cols, [order_col], keep, unique_order=unique_order
    )
    if tombstone_col is None:
        delta = delta.withColumn("_dead", F.lit(False))
    else:
        delta = delta.withColumn(
            "_dead", F.coalesce(F.col(tombstone_col).cast("boolean"), F.lit(False))
        ).drop(tombstone_col)
    if keep_tombstones and tombstone_col is None:
        raise ValueError("keep_tombstones requires tombstone_col")

    def finish(df: DataFrame) -> DataFrame:
        if keep_tombstones:
            return df.select(
                *key_cols, *value_cols, order_col,
                F.col("_dead").alias(tombstone_col),
            )
        return (
            df.filter(~F.col("_dead"))
            .drop("_dead")
            .select(*key_cols, *value_cols, order_col)
        )

    if snapshot is None:
        return finish(delta)

    # boundary validation (same convention as the reserved-name check):
    # a snapshot missing its order/value columns — e.g. a raw dimension
    # table instead of a previous apply_changes output — used to surface
    # as a cryptic UNRESOLVED_COLUMN deep inside the merge projection
    missing = [
        c
        for c in list(key_cols) + list(value_cols) + [order_col]
        if c not in snapshot.columns
    ]
    if missing:
        raise ValueError(
            f"apply_changes snapshot is missing column(s) {missing}: the "
            "snapshot must carry key_cols + value_cols + [order_col] (the "
            "shape a previous apply_changes produced); fold from scratch "
            "with snapshot=None instead"
        )

    if tombstone_col is not None and tombstone_col in snapshot.columns:
        # honor a marker-bearing snapshot in EVERY mode: feeding a
        # keep_tombstones=True output back with the default mode must not
        # resurrect its dead keys as live NULL rows — the marker still
        # participates in the order comparison, and default-mode finish()
        # filters the dead rows out of the result
        snapshot = snapshot.withColumn(
            "_s_dead",
            F.coalesce(F.col(tombstone_col).cast("boolean"), F.lit(False)),
        ).drop(tombstone_col)
    else:
        snapshot = snapshot.withColumn("_s_dead", F.lit(False))

    d = delta.select(
        *[F.col(k).alias(f"_dk_{k}") for k in key_cols],
        *[F.col(c).alias(f"_d_{c}") for c in list(value_cols) + [order_col]],
        "_dead",
        F.lit(True).alias("_d_present"),
    )
    # NULL-SAFE key equality: a NULL grouping key is a legitimate group
    # (both the snapshot fold and the delta aggregation emit one row for
    # it) — the plain USING join's null-unsafe equality never matched the
    # two, so a NULL-key update DUPLICATED the key instead of merging it
    # (execution-confirmed vs the whole-log fold; r10 NULL-key campaign).
    # <=> is a supported equi-join key, so the plan is still a hash join.
    cond = None
    for k in key_cols:
        c = F.col(k).eqNullSafe(F.col(f"_dk_{k}"))
        cond = c if cond is None else cond & c
    merged = snapshot.join(d, on=cond, how="full_outer").select(
        # key value from whichever side is PRESENT (both NULL on a matched
        # NULL-key row, so the sentinel — not the key — decides presence)
        *[
            F.when(F.col("_d_present").isNotNull(), F.col(f"_dk_{k}"))
            .otherwise(F.col(k))
            .alias(k)
            for k in key_cols
        ],
        *[F.col(c) for c in list(value_cols) + [order_col]],
        "_s_dead",
        *[F.col(f"_d_{c}") for c in list(value_cols) + [order_col]],
        "_dead",
        "_d_present",
    )
    # the delta wins only where it is PRESENT and NOT OLDER than the
    # snapshot's recorded position (order_col is unique per key, so >= is
    # the exact boundary for an idempotent re-apply of the same batch).
    # Presence is tracked by a sentinel, NOT by _d_<order_col> being
    # non-null: a delta row with a NULL order position must still win
    # against an absent snapshot entry (and lose to any present one —
    # NULL sorts as minus-infinity here), never silently vanish.
    delta_wins = F.coalesce(
        F.col("_d_present")
        & (
            F.col(order_col).isNull()
            | (F.col(f"_d_{order_col}") >= F.col(order_col))
        ),
        F.lit(False),
    )
    out = merged.select(
        *[F.col(k) for k in key_cols],
        *[
            F.when(delta_wins, F.col(f"_d_{c}"))
            .otherwise(F.col(c))
            .alias(c)
            for c in value_cols
        ],
        F.when(delta_wins, F.col(f"_d_{order_col}"))
        .otherwise(F.col(order_col))
        .alias(order_col),
        F.when(delta_wins, F.col("_dead"))
        .otherwise(F.col("_s_dead"))
        .alias("_dead"),
    )
    return finish(out)
