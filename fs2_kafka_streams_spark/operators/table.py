"""MaterializedTable — API parity with the reference's ReadOnlyTable/Table.

Reference (``streams/Table.scala:10-41``):
  get(k): F[Option[V]]          → point lookup
  getAll(ks): F[Map[K,Option[V]]] → multi-get, missing keys → None
  scan: Stream[F,(K,V)]          → full scan
  delete(k) / tombstones         → key removal
  lastCommittedOffset            → recovery bookkeeping

Spark re-expression: the table IS a DataFrame (the latest-by-key
materialization of a changelog, ``streams/Tables.scala:46-70``). Point and
multi-get are broadcast joins from the key set (the distributed analogue of
RocksDB multiGet, ``PolyKVStore.scala:122-133``); scan is the DataFrame
itself. Tombstones: a NULL value column deletes the key (the reference
exposes ``delete`` but its shipped materializer never emits it — we support
both behaviors via ``respect_tombstones``).
"""

from __future__ import annotations

from collections.abc import Sequence
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fs2_kafka_streams_spark.operators.latest_by_key import latest_by_key


class MaterializedTable:
    """A keyed latest-value view of a changelog DataFrame."""

    def __init__(
        self,
        changelog: DataFrame,
        key_cols: Sequence[str],
        order_cols: Sequence[str],
        value_cols: Sequence[str] | None = None,
        tombstone_col: str | None = None,
        unique_order: bool = False,
    ):
        self.key_cols = list(key_cols)
        self.order_cols = list(order_cols)
        self.value_cols = list(
            value_cols
            if value_cols is not None
            else [c for c in changelog.columns if c not in key_cols]
        )
        self._changelog = changelog
        self._tombstone_col = tombstone_col
        # unique_order: caller's promise that order_cols never ties per key
        # (e.g. Kafka offsets) — halves the max_by comparator state.
        self._unique_order = unique_order
        snap = latest_by_key(
            changelog, key_cols, order_cols, self.value_cols,
            unique_order=unique_order,
        )
        if tombstone_col is not None:
            # a tombstone (NULL value) as the latest write removes the key.
            # NOTE the convention: this is Kafka's null-VALUE tombstone
            # (the reference's Table.delete), the OPPOSITE of the boolean
            # True-means-delete flag that apply_changes/changelog_history/
            # the streaming deletes engines call tombstone_col — reject a
            # boolean column loudly rather than silently keeping deleted
            # keys (True is non-null) and dropping NULL-flagged live rows
            from pyspark.sql.types import BooleanType

            if isinstance(changelog.schema[tombstone_col].dataType, BooleanType):
                raise TypeError(
                    "MaterializedTable tombstone_col uses the null-VALUE "
                    "convention (NULL in this column deletes the key); a "
                    "boolean True-means-delete flag belongs to "
                    "apply_changes/changelog_history — pass the nullable "
                    "value column instead"
                )
            snap = snap.filter(F.col(tombstone_col).isNotNull())
        self._snapshot = snap

    # -- reads (A10–A12) ---------------------------------------------------

    def scan(self) -> DataFrame:
        """Full scan — the materialized view itself (A12)."""
        return self._snapshot

    def get(self, key: Any | tuple) -> dict | None:
        """Point lookup (A10). Returns the value row dict or None.

        Presence is decided by a join marker, NOT by all-NULL value
        columns — a key whose latest write genuinely carries NULL values
        is Some(null row), not None (the ``Map[K, Option[V]]`` contract).
        """
        out = self._get_all([key], marker=True).collect()[0]
        d = out.asDict()
        if not d["_found"]:
            return None
        return {c: d[c] for c in self.value_cols}

    def get_all(self, keys: Sequence[Any | tuple]) -> DataFrame:
        """Multi-get (A11): preserves requested keys, missing → NULL row —
        exactly the reference's ``Map[K, Option[V]]`` contract
        (``streams/Table.scala:61-62``).

        Scale path: the key prune is applied to the CHANGELOG, below the
        latest-by-key aggregation (latest-of-a-key-subset == subset-of-
        latest, since the aggregation is per-key). A single-column literal
        key set becomes an ``isin`` predicate that reaches the parquet scan
        (``PushedFilters: In(...)`` — row groups whose min/max exclude the
        keys are never read); composite keys use a broadcast semi-join,
        which prunes before the aggregation shuffle. Never broadcasts or
        fully aggregates the table itself.
        """
        return self._get_all(keys)

    def _get_all(
        self, keys: Sequence[Any | tuple], marker: bool = False
    ) -> DataFrame:
        spark = self._snapshot.sparkSession
        # dedupe (order-preserving): a Map result has one row per KEY, and
        # a duplicated request key would otherwise duplicate output rows
        rows = list(dict.fromkeys(
            k if isinstance(k, tuple) else (k,) for k in keys
        ))
        schema_fields = ", ".join(
            f"{c} {self._snapshot.schema[c].dataType.simpleString()}"
            for c in self.key_cols
        )
        keys_df = spark.createDataFrame(rows, schema_fields)
        if len(self.key_cols) == 1:
            pruned_log = self._changelog.filter(
                F.col(self.key_cols[0]).isin([r[0] for r in rows])
            )
        else:
            pruned_log = self._changelog.join(
                F.broadcast(keys_df), on=self.key_cols, how="left_semi"
            )
        matched = latest_by_key(
            pruned_log, self.key_cols, self.order_cols, self.value_cols,
            unique_order=self._unique_order,
        )
        if self._tombstone_col is not None:
            matched = matched.filter(F.col(self._tombstone_col).isNotNull())
        if marker:
            matched = matched.withColumn("_found", F.lit(True))
        out = keys_df.join(
            F.broadcast(matched), on=self.key_cols, how="left"
        )
        if marker:
            out = out.withColumn(
                "_found", F.coalesce("_found", F.lit(False))
            )
        return out

    def last_committed_offset(self) -> Any:
        """Highest changelog position applied (A17,
        ``streams/Table.scala:67-68``) — here max of the first order col."""
        col = self.order_cols[0]
        return self._changelog.agg(F.max(col)).collect()[0][0]


def join_with(
    stream: DataFrame, table: MaterializedTable, how: str = "left"
) -> DataFrame:
    """Stream–table enrichment join (A14, ``ReadOnlyTableSpec.scala:77-79``):
    each stream row gains the table's current value for its key; misses stay
    as NULLs (Option[V] = None)."""
    return stream.join(table.scan(), on=table.key_cols, how=how)
