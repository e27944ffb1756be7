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
) -> DataFrame:
    """Merge ``changes`` onto ``snapshot`` with last-write-wins per key.

    ``snapshot`` columns: ``key_cols + value_cols + [order_col]`` (as
    produced by a previous ``apply_changes`` — pass ``None`` to fold a
    changelog from scratch). ``changes`` is raw changelog rows with the
    same key/value/order columns plus the optional boolean
    ``tombstone_col``.
    """
    keep = list(value_cols) + [order_col]
    if tombstone_col is not None:
        keep = keep + [tombstone_col]
    delta = latest_by_key(changes, key_cols, [order_col], keep)
    if tombstone_col is None:
        delta = delta.withColumn("_dead", F.lit(False))
    else:
        delta = delta.withColumn(
            "_dead", F.coalesce(F.col(tombstone_col).cast("boolean"), F.lit(False))
        ).drop(tombstone_col)

    if snapshot is None:
        return (
            delta.filter(~F.col("_dead"))
            .drop("_dead")
            .select(*key_cols, *value_cols, order_col)
        )

    d = delta.select(
        *[F.col(k) for k in key_cols],
        *[F.col(c).alias(f"_d_{c}") for c in list(value_cols) + [order_col]],
        "_dead",
    )
    merged = snapshot.join(d, on=list(key_cols), how="full_outer")
    # delta wins where present; tombstoned keys drop out entirely
    out = merged.filter(
        F.col("_dead").isNull() | ~F.col("_dead")
    ).select(
        *[F.col(k) for k in key_cols],
        *[
            F.when(
                F.col(f"_d_{order_col}").isNotNull(), F.col(f"_d_{c}")
            ).otherwise(F.col(c)).alias(c)
            for c in value_cols
        ],
        F.coalesce(F.col(f"_d_{order_col}"), F.col(order_col)).alias(order_col),
    )
    return out
